"""Multi-format IO: YAML/TOML config loading, HDF5/ASCII snapshots.

The reference ADVERTISES hierarchical JSON/YAML/TOML configuration
(configuration_manager.hpp:58-131; loaders stubbed,
configuration_manager.cpp:13-23) and HDF5/binary/ASCII output with
compression (README.md "Comprehensive I/O"; interface-only,
interfaces.hpp:70-82). Here they are real.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.utils import checkpoint as ckpt


@pytest.fixture
def state():
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (64, 3), maxval=10.0)
    vel = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    m = jnp.ones((64,))
    return make_state(pos, vel, m, scale_factor=0.25)


class TestConfigFormats:
    payload = {"particles": {"num_particles": 4096, "box_size": 42.0},
               "forces": {"type": "pm", "pm_grid_size": 32}}

    def check(self, cfg):
        assert cfg.particles.num_particles == 4096
        assert cfg.particles.box_size == 42.0
        assert cfg.forces.type == "pm"

    def test_yaml(self, tmp_path):
        yaml = pytest.importorskip("yaml")
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(self.payload))
        self.check(SimulationConfig.from_file(str(p)))

    def test_toml(self, tmp_path):
        p = tmp_path / "cfg.toml"
        p.write_text(
            '[particles]\nnum_particles = 4096\nbox_size = 42.0\n'
            '[forces]\ntype = "pm"\npm_grid_size = 32\n')
        self.check(SimulationConfig.from_file(str(p)))

    def test_json_still_works(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(self.payload))
        self.check(SimulationConfig.from_file(str(p)))

    def test_reference_hdf5_format_maps_to_real_writer(self):
        cfg = SimulationConfig.from_dict(
            {"io": {"output_format": "HDF5"},
             "simulation": {"name": "x"}})
        assert cfg.io.output_format == "hdf5"


class TestSnapshotFormats:
    def test_hdf5_roundtrip(self, tmp_path, state):
        pytest.importorskip("h5py")
        path = ckpt.save_snapshot(str(tmp_path / "snap.h5"), state)
        got, meta = ckpt.load_snapshot(path)
        np.testing.assert_array_equal(np.asarray(got.positions),
                                      np.asarray(state.positions))
        np.testing.assert_array_equal(np.asarray(got.velocities),
                                      np.asarray(state.velocities))
        assert float(got.scale_factor) == float(state.scale_factor)
        assert int(got.step) == int(state.step)

    def test_hdf5_is_compressed_and_carries_config(self, tmp_path, state):
        h5py = pytest.importorskip("h5py")
        cfg = SimulationConfig()
        path = ckpt.save_snapshot(str(tmp_path / "snap.hdf5"), state, cfg)
        with h5py.File(path, "r") as f:
            assert f["particles"]["positions"].compression == "gzip"
            assert "config" in f.attrs
        _, meta = ckpt.load_snapshot(path)
        assert meta["config"]["particles"]["num_particles"] \
            == cfg.particles.num_particles

    def test_ascii_snapshot(self, tmp_path, state):
        path = ckpt.save_snapshot(str(tmp_path / "snap.txt"), state)
        table = np.loadtxt(path)
        assert table.shape == (64, 7)
        np.testing.assert_allclose(table[:, 0:3],
                                   np.asarray(state.positions), rtol=1e-6)
        head = open(path).readline()
        assert "a=" in head and "columns=x y z vx vy vz mass" in head

    def test_field_filtered_npz_roundtrip(self, tmp_path, state):
        path = ckpt.save_snapshot(str(tmp_path / "s.npz"), state,
                                  fields=["positions", "masses"])
        got, _ = ckpt.load_snapshot(path)
        np.testing.assert_array_equal(np.asarray(got.positions),
                                      np.asarray(state.positions))
        # omitted velocities reconstruct as zeros
        assert float(jnp.max(jnp.abs(got.velocities))) == 0.0

    def test_engine_output_format_extension(self, tmp_path, state):
        from lambda_cdm_tpu.core.engine import SimulationEngine
        cfg = SimulationConfig()
        cfg.particles.num_particles = 64
        cfg.particles.box_size = 10.0
        cfg.particles.initial_conditions.type = "uniform_random"
        cfg.forces.type = "direct_reference"
        pytest.importorskip("h5py")
        cfg.io.output_format = "hdf5"
        cfg.io.snapshots.filename_pattern = str(
            tmp_path / "snap_{step:06d}_{redshift:.3f}.npz")
        cfg.profiling.output_file = ""
        eng = SimulationEngine(cfg)
        eng.initialize(state=state)
        out = eng.save_snapshot()
        assert out.endswith(".h5")
        got, _ = ckpt.load_snapshot(out)
        assert got.positions.shape == (64, 3)
