"""Config system tests: JSON parsing (native + reference schema),
path access, env/CLI overrides, validation."""

import json

import pytest

from lambda_cdm_tpu.core.config import SimulationConfig


REFERENCE_STYLE = {
    "simulation": {"name": "RefStyle", "output_frequency": 7},
    "physics": {
        "cosmology": {
            "model": "LambdaCDMModel",
            "parameters": {"omega_m": 0.3, "omega_lambda": 0.7,
                           "omega_b": 0.05, "h": 0.7, "sigma_8": 0.8,
                           "n_s": 0.96},
            "initial_redshift": 99.0,
            "final_redshift": 0.0,
        },
        "forces": {
            "primary_computer": {
                "type": "TreeForceComputer",
                "parameters": {"opening_angle": 0.5,
                               "softening_length": 0.02},
            },
            "fallback_computers": [
                {"type": "DirectForceComputer", "parameters": {}}],
        },
        "integration": {
            "integrator": {"type": "LeapfrogIntegrator",
                           "parameters": {"adaptive_timestep": True,
                                          "max_timestep": 0.05}},
        },
    },
    "particles": {
        "num_particles": 4096, "box_size": 50.0,
        "initial_conditions": {
            "generator": {"type": "ZelDovichGenerator",
                          "parameters": {"power_spectrum": "CDM",
                                         "random_seed": 99,
                                         "grid_size": 32,
                                         "use_2lpt": True}}},
    },
    "compute": {
        "gpu": {"enabled": True},
        "tensorrt": {"enabled": True, "precision": "FP16",
                     "max_batch_size": 200000},
        "mpi": {"enabled": False, "load_balancing": True},
    },
    "time": {"initial_timestep": 0.005, "final_time": 5.0},
    "io": {"output_format": "HDF5"},
}


class TestReferenceSchema:
    """The reference's config JSON (examples/configs/basic_lambda_cdm.json
    layout) must load unchanged -- its own loader never parsed it
    (configuration_manager.cpp:13-23)."""

    def test_loads(self, tmp_path):
        p = tmp_path / "ref.json"
        p.write_text(json.dumps(REFERENCE_STYLE))
        cfg = SimulationConfig.from_file(str(p))
        assert cfg.simulation.name == "RefStyle"
        assert cfg.cosmology.omega_m == 0.3
        assert cfg.cosmology.sigma_8 == 0.8
        assert cfg.cosmology.initial_redshift == 99.0
        assert cfg.forces.type == "treepm"          # TreeForceComputer
        assert cfg.forces.softening_length == 0.02
        assert cfg.forces.fallback == "direct"
        assert cfg.integration.adaptive_timestep is True
        assert cfg.particles.num_particles == 4096
        assert cfg.particles.initial_conditions.random_seed == 99
        assert cfg.particles.initial_conditions.type == "zeldovich"
        assert cfg.particles.initial_conditions.power_spectrum == \
            "eisenstein_hu"
        assert cfg.compute.tpu.precision == "bfloat16"  # FP16 -> bf16
        assert cfg.compute.tpu.max_particles == 200000
        assert cfg.time.initial_timestep == 0.005
        assert cfg.io.output_format == "hdf5"       # real h5py writer

    def test_validates(self):
        cfg = SimulationConfig.from_dict(REFERENCE_STYLE)
        cfg.validate()


class TestPathAccess:
    def test_get(self):
        cfg = SimulationConfig()
        assert cfg.get("cosmology.omega_m") == 0.31
        assert cfg.get("io.analysis.power_spectrum.num_bins") == 100
        assert cfg.get("nonexistent.path", 42) == 42

    def test_set_coerces(self):
        cfg = SimulationConfig()
        cfg.set("cosmology.h", "0.7")
        assert cfg.get("cosmology.h") == 0.7
        cfg.set("particles.num_particles", "1000")
        assert cfg.get("particles.num_particles") == 1000


class TestOverrides:
    def test_env(self):
        cfg = SimulationConfig()
        cfg.apply_env_overrides({"LCDM_cosmology__omega_m": "0.25",
                                 "LCDM_cosmology__omega_lambda": "0.75",
                                 "OTHER": "ignored"})
        assert cfg.cosmology.omega_m == 0.25

    def test_cli(self):
        cfg = SimulationConfig()
        rest = cfg.apply_cli_overrides(
            ["--time.initial_timestep=0.002", "positional",
             "--forces.type=pm"])
        assert cfg.time.initial_timestep == 0.002
        assert cfg.forces.type == "pm"
        assert rest == ["positional"]


class TestValidation:
    def test_rejects_bad_omega(self):
        cfg = SimulationConfig()
        cfg.cosmology.omega_m = 0.9
        with pytest.raises(ValueError):
            cfg.validate()

    def test_rejects_bad_force_type(self):
        cfg = SimulationConfig()
        cfg.forces.type = "barnes_hut_gpu"
        with pytest.raises(ValueError):
            cfg.validate()

    def test_roundtrip(self, tmp_path):
        cfg = SimulationConfig()
        cfg.cosmology.h = 0.72
        p = tmp_path / "out.json"
        cfg.save(str(p))
        cfg2 = SimulationConfig.from_file(str(p))
        assert cfg2.cosmology.h == 0.72
        assert cfg2.to_dict() == cfg.to_dict()

    def test_cosmology_params_bridge(self):
        cfg = SimulationConfig()
        params = cfg.cosmology_params()
        assert float(params.omega_m) == 0.31
        assert float(params.sigma8) == 0.81
