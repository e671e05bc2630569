"""Analysis-observer tests: cadence, config assembly, recorded content."""

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu import SimulationConfig, SimulationEngine
from lambda_cdm_tpu.core.analysis_observers import (
    ConservationObserver, HaloFinderObserver, LensingObserver,
    PowerSpectrumObserver, SnapshotObserver, build_observers_from_config)


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

def tiny_config(tmp_path=None):
    cfg = SimulationConfig()
    cfg.particles.num_particles = 512
    cfg.particles.box_size = 50.0
    cfg.particles.initial_conditions.type = "zeldovich"
    cfg.particles.initial_conditions.grid_size = 8
    cfg.forces.type = "direct_reference"
    cfg.forces.softening_length = 0.5
    cfg.time.initial_timestep = 1e-5
    cfg.cosmology.initial_redshift = 24.0
    cfg.simulation.output_frequency = 5
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    if tmp_path is not None:
        cfg.simulation.output_directory = str(tmp_path)
    return cfg


class TestPowerSpectrumObserver:
    def test_fires_at_cadence(self):
        obs = PowerSpectrumObserver(frequency=5, grid_size=16, num_bins=8)
        eng = SimulationEngine(tiny_config(), observers=[obs])
        eng.initialize()
        eng.run(num_steps=10)
        assert len(obs.results) == 2          # steps 5 and 10
        rec = obs.results[-1]
        assert rec["step"] == 10
        assert rec["k"].shape == (8,)
        assert np.all(np.isfinite(rec["power"]))


class TestConservationObserver:
    def test_tracks_energy_and_momentum(self):
        obs = ConservationObserver(energy=True, momentum=True)
        eng = SimulationEngine(tiny_config(), observers=[obs])
        eng.initialize()
        eng.run(num_steps=10)
        assert len(obs.history) >= 1
        rec = obs.history[-1]
        assert "total" in rec and "momentum" in rec
        assert np.isfinite(rec["total"])


class TestSnapshotObserver:
    def test_writes_files(self, tmp_path):
        obs = SnapshotObserver(frequency=5, directory=str(tmp_path))
        eng = SimulationEngine(tiny_config(), observers=[obs])
        eng.initialize()
        eng.run(num_steps=10)
        assert len(obs.written) == 2
        from lambda_cdm_tpu.utils.checkpoint import load_snapshot
        st, meta = load_snapshot(obs.written[-1])
        assert st.positions.shape == (512, 3)


class TestLensingObserver:
    def test_produces_map(self):
        obs = LensingObserver(frequency=5, grid_size=16, n_planes=2)
        eng = SimulationEngine(tiny_config(), observers=[obs])
        eng.initialize()
        eng.run(num_steps=5)
        assert len(obs.maps) == 1
        assert obs.maps[0]["kappa"].shape == (16, 16)

    def test_renders_png(self, tmp_path):
        """render_dir writes a PNG per map (the reference README's
        'built-in raytracing visualization' claim, real here)."""
        pytest.importorskip("matplotlib")
        obs = LensingObserver(frequency=5, grid_size=16, n_planes=2,
                              render_dir=str(tmp_path / "maps"))
        eng = SimulationEngine(tiny_config(), observers=[obs])
        eng.initialize()
        eng.run(num_steps=5)
        png = obs.maps[0].get("png")
        assert png and png.endswith(".png")
        import os
        assert os.path.getsize(png) > 1000


class TestHaloObserver:
    def test_runs_on_clustered_state(self):
        import jax
        from lambda_cdm_tpu.core.state import make_state
        cfg = tiny_config()
        # clustered blob + field so FoF finds something
        key = jax.random.PRNGKey(0)
        blob = 25.0 + 1.0 * jax.random.normal(key, (100, 3))
        field = jax.random.uniform(jax.random.PRNGKey(1), (412, 3),
                                   maxval=50.0)
        pos = jnp.mod(jnp.concatenate([blob, field]), 50.0)
        st = make_state(pos, jnp.zeros_like(pos), jnp.ones((512,)),
                        scale_factor=0.5)
        obs = HaloFinderObserver(frequency=1, min_particles=20)
        eng = SimulationEngine(cfg, observers=[obs])
        eng.initialize(state=st)
        eng.run(num_steps=1)
        assert len(obs.catalogs) == 1
        assert obs.catalogs[0]["num_halos"] >= 1


class TestBuildFromConfig:
    def test_assembles_configured_set(self):
        cfg = tiny_config()
        cfg.io.snapshots.enabled = True
        cfg.io.analysis.power_spectrum.enabled = True
        cfg.io.analysis.halo_finder.enabled = True
        cfg.io.diagnostics.energy_conservation = True
        cfg.io.diagnostics.particle_statistics = False
        obs = build_observers_from_config(cfg)
        kinds = {type(o).__name__ for o in obs}
        assert kinds == {"SnapshotObserver", "PowerSpectrumObserver",
                         "HaloFinderObserver", "ConservationObserver"}

    def test_particle_statistics_default_on(self):
        # io.diagnostics.particle_statistics defaults True (reference
        # config parity: basic_lambda_cdm.json's diagnostics block) and
        # builds a real observer since the round-4 config wiring
        cfg = tiny_config()
        cfg.io.snapshots.enabled = False
        cfg.io.analysis.enabled = False
        cfg.io.diagnostics.energy_conservation = False
        cfg.io.diagnostics.momentum_conservation = False
        kinds = {type(o).__name__
                 for o in build_observers_from_config(cfg)}
        assert kinds == {"ParticleStatisticsObserver"}

    def test_disabled_yields_none(self):
        cfg = tiny_config()
        cfg.io.snapshots.enabled = False
        cfg.io.analysis.enabled = False
        cfg.io.diagnostics.energy_conservation = False
        cfg.io.diagnostics.momentum_conservation = False
        cfg.io.diagnostics.particle_statistics = False
        assert build_observers_from_config(cfg) == []


class TestJaxTraceCapture:
    def test_trace_dir_writes_profile(self, tmp_path):
        """profiling.trace_dir captures a jax.profiler device trace of
        the run loop (the working analogue of the reference's unused
        cuda_profiler_api include, lambda_cdm_kernels.cu:1)."""
        import glob
        cfg = tiny_config(tmp_path)
        cfg.profiling.trace_dir = str(tmp_path / "trace")
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=5)
        files = glob.glob(str(tmp_path / "trace" / "**" / "*"),
                          recursive=True)
        assert files, "no trace artifacts written"
