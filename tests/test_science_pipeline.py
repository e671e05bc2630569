"""End-to-end science pipeline: ICs -> evolve -> P(k) + halos + lensing.

One integration test exercising the full production chain the way a
user would run it -- the capability the reference's README promises
("Real-time Analysis ... Built-in raytracing") wired through actual
config-driven observers on the actual fast stepper.
"""

import numpy as np
import pytest

from lambda_cdm_tpu.core.analysis_observers import (ConservationObserver,
                                                    HaloFinderObserver,
                                                    LensingObserver,
                                                    PowerSpectrumObserver)
from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    ngrid, box = 16, 100.0
    cfg = SimulationConfig()
    cfg.particles.num_particles = ngrid ** 3
    cfg.particles.box_size = box
    ic = cfg.particles.initial_conditions
    ic.type = "2lpt"
    ic.grid_size = ngrid
    ic.random_seed = 3
    cfg.forces.type = "treepm_fast"
    cfg.forces.pm_grid_size = 32
    cfg.forces.softening_length = 1.0
    cfg.forces.rebucket_every = 8
    cfg.cosmology.initial_redshift = 19.0
    cfg.cosmology.final_redshift = 4.0
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.04
    cfg.time.initial_timestep = 1e-3
    cfg.simulation.output_frequency = 8
    cfg.simulation.output_directory = str(tmp_path)
    cfg.simulation.checkpoint_frequency = 16
    cfg.profiling.output_file = str(tmp_path / "prof.json")

    # grid-based LPT ICs carry no Poisson shot noise below the particle
    # Nyquist; subtracting V/N would swamp the early-z power
    obs_pk = PowerSpectrumObserver(frequency=16, grid_size=32,
                                   directory=str(tmp_path),
                                   subtract_shot_noise=False)
    obs_halo = HaloFinderObserver(frequency=24, linking_length=0.2,
                                  min_particles=8)
    obs_lens = LensingObserver(frequency=24, grid_size=32, n_planes=4,
                               render_dir=str(tmp_path / "maps"))
    obs_cons = ConservationObserver()
    eng = SimulationEngine(cfg, observers=[obs_cons, obs_pk, obs_halo,
                                           obs_lens])
    eng.initialize()
    eng.run(num_steps=48)

    # evolution happened and stayed finite
    a1 = float(eng.state.scale_factor)
    assert a1 > 0.06, f"barely evolved: a={a1}"
    assert bool(np.isfinite(np.asarray(eng.state.positions)).all())

    # P(k): measured at least twice, positive large-scale power,
    # LATE amplitude above EARLY (growth)
    assert len(obs_pk.results) >= 2
    p0, p1 = obs_pk.results[0], obs_pk.results[-1]
    k0 = np.asarray(p0["k"])
    sel = (k0 > 0) & (k0 < 0.5)
    assert np.nansum(np.asarray(p1["power"])[sel]) > \
        np.nansum(np.asarray(p0["power"])[sel]) > 0

    # halos: the finder ran (catalog may be small at this N)
    assert len(obs_halo.catalogs) >= 1

    # lensing: maps produced AND rendered to PNGs
    assert len(obs_lens.maps) >= 1
    assert obs_lens.maps[0]["kappa"].shape == (32, 32)
    assert obs_lens.maps[0].get("png")

    # conservation tracking populated
    assert len(obs_cons.history) >= 2

    # profiling report written with populated statistics
    import json
    rep = json.loads(open(tmp_path / "prof.json").read())
    assert rep["statistics"]["total_steps"] >= 48
