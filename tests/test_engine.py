"""End-to-end engine tests: builder, lifecycle, run loop, observers,
energy conservation, checkpoint/resume bit-exactness.

This reproduces the reference's de-facto test, cuda_nbody_test
(examples/cuda_nbody_test.cpp:9-101) -- N-body KDK steps with energy
tracking -- as a real pytest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu import (EnergyMonitor, LifecycleState, SimulationBuilder,
                            SimulationConfig, SimulationEngine)
from lambda_cdm_tpu.core.state import random_state


def small_config(n=128, solver="direct_reference"):
    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = 50.0
    cfg.particles.initial_conditions.type = "uniform_random"
    cfg.forces.type = solver
    cfg.forces.softening_length = 0.5
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 49.0
    cfg.simulation.output_frequency = 5
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    cfg.units.system = "box"
    cfg.units.G = 1.0
    cfg.units.H0_internal = 0.1
    return cfg


class TestLifecycle:
    def test_state_machine(self):
        eng = SimulationEngine(small_config())
        assert eng.lifecycle == LifecycleState.UNINITIALIZED
        eng.initialize()
        assert eng.lifecycle == LifecycleState.INITIALIZED
        eng.run(num_steps=10)
        assert eng.lifecycle == LifecycleState.FINISHED
        assert eng.statistics.total_steps == 10
        eng.reset()
        assert eng.lifecycle == LifecycleState.UNINITIALIZED

    def test_step_before_init_raises(self):
        eng = SimulationEngine(small_config())
        with pytest.raises(RuntimeError):
            eng.step()

    def test_error_state_on_bad_config(self):
        cfg = small_config()
        cfg.particles.num_particles = -5
        eng = SimulationEngine(cfg)
        with pytest.raises(ValueError):
            eng.initialize()
        assert eng.lifecycle == LifecycleState.ERROR


class TestBuilder:
    def test_fluent_build(self):
        eng = (SimulationBuilder()
               .with_particles(64)
               .with_box_size(25.0)
               .with_time_step(1e-4)
               .with_force_computer("direct_reference", softening_length=0.3)
               .with_cosmology(initial_redshift=9.0)
               .with_initial_conditions("uniform_random")
               .with_units("box", G=1.0, H0_internal=0.1)
               .build())
        assert eng.lifecycle == LifecycleState.INITIALIZED
        assert eng.state.num_particles == 64
        assert float(eng.state.scale_factor) == pytest.approx(0.1)

    def test_initial_state_passthrough(self):
        st = random_state(jax.random.PRNGKey(3), 32, 25.0)
        eng = (SimulationBuilder()
               .with_particles(32).with_box_size(25.0)
               .with_initial_state(st)
               .with_force_computer("direct_reference")
               .build())
        np.testing.assert_array_equal(np.asarray(eng.state.positions),
                                      np.asarray(st.positions))


class TestRunLoop:
    def test_steps_advance_state(self):
        eng = SimulationEngine(small_config())
        eng.initialize()
        a0 = float(eng.state.scale_factor)
        eng.run(num_steps=20)
        assert int(eng.state.step) == 20
        assert float(eng.state.scale_factor) > a0

    def test_observer_hooks_fire(self):
        from lambda_cdm_tpu.core.observers import Observer

        calls = []

        class Spy(Observer):
            def on_simulation_start(self, engine):
                calls.append("start")

            def on_step_end(self, engine, step):
                calls.append(f"step{step}")

            def on_simulation_end(self, engine):
                calls.append("end")

        eng = SimulationEngine(small_config(), observers=[Spy()])
        eng.initialize()
        eng.run(num_steps=10)
        assert calls[0] == "start" and calls[-1] == "end"
        assert any(c.startswith("step") for c in calls)

    def test_release_force_state_then_resume(self):
        """release_force_state() frees the fast buckets for analysis
        (the 1M z=0 FoF OOM'd with them resident) and a later run()/
        step() must rebuild the fast path transparently — the first
        implementation left _accel_fn as the fast-path sentinel raiser
        and resume died with 'treepm_fast drives the loop directly'."""
        cfg = small_config(n=512, solver="treepm_fast")
        cfg.forces.softening_length = 1.0
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=10)
        assert eng._fstate is not None
        a_mid = float(eng.state.scale_factor)
        eng.release_force_state()
        assert eng._fstate is None
        eng.run(num_steps=5)          # must re-bucket, not raise
        assert eng._fstate is not None
        assert float(eng.state.scale_factor) > a_mid
        eng.release_force_state()
        eng.release_force_state()     # double release is a no-op
        eng.step(2)                   # step() rebuilds too
        assert int(eng.statistics.total_steps) == 17

    def test_stops_at_final_redshift(self):
        cfg = small_config()
        cfg.cosmology.initial_redshift = 1.0
        cfg.cosmology.final_redshift = 0.9
        cfg.units.H0_internal = 100.0
        cfg.time.initial_timestep = 1e-5
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=100000)
        z = float(eng.state.redshift)
        assert z <= 0.9 + 1e-3
        assert eng.statistics.total_steps < 100000

    def test_energy_conservation_quiet_start(self):
        """Cold uniform particles, tiny dt, Newtonian-ish: dE/E < 1e-3
        (reference claims <0.1%; CLAUDE.md:256)."""
        cfg = small_config(n=256)
        cfg.cosmology.model = "Newtonian"
        monitor = EnergyMonitor()
        eng = SimulationEngine(cfg, observers=[monitor])
        eng.initialize()
        # give particles small velocities
        st = eng.state
        vel = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                       st.velocities.shape)
        eng.state = st.replace(velocities=vel)
        eng.run(num_steps=50)
        assert monitor.history[-1]["relative_error"] < 1e-3

    def test_momentum_conserved(self):
        cfg = small_config(n=128)
        cfg.cosmology.model = "Newtonian"
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=30)
        p = np.asarray(eng.momentum())
        assert np.max(np.abs(p)) < 1e-2


class TestEnergyAPI:
    def test_compute_energy_real(self):
        eng = SimulationEngine(small_config())
        eng.initialize()
        e = eng.compute_energy()
        assert float(e["kinetic"]) >= 0
        assert float(e["potential"]) < 0
        assert np.isfinite(float(e["total"]))


class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path):
        eng = SimulationEngine(small_config())
        eng.initialize()
        eng.run(num_steps=10)
        path = str(tmp_path / "ckpt")
        eng.save_checkpoint(path)

        eng2 = SimulationEngine(small_config())
        eng2.load_checkpoint(path)
        np.testing.assert_array_equal(np.asarray(eng2.state.positions),
                                      np.asarray(eng.state.positions))
        np.testing.assert_array_equal(np.asarray(eng2.state.velocities),
                                      np.asarray(eng.state.velocities))
        assert int(eng2.state.step) == int(eng.state.step)

    def test_resume_continues_identically(self, tmp_path):
        """checkpoint at step 10, run to 20 -> identical to straight 20."""
        cfg = small_config()
        eng_a = SimulationEngine(cfg)
        eng_a.initialize()
        eng_a.run(num_steps=10)
        path = str(tmp_path / "mid")
        eng_a.save_checkpoint(path)
        eng_a.run(num_steps=10)

        eng_b = SimulationEngine(small_config())
        eng_b.load_checkpoint(path)
        eng_b.run(num_steps=10)
        np.testing.assert_allclose(np.asarray(eng_b.state.positions),
                                   np.asarray(eng_a.state.positions),
                                   atol=1e-6)

    def test_snapshot_fields(self, tmp_path):
        from lambda_cdm_tpu.utils.checkpoint import load_snapshot
        eng = SimulationEngine(small_config())
        eng.initialize()
        path = eng.save_snapshot(str(tmp_path / "snap"))
        st, meta = load_snapshot(path)
        assert st.positions.shape == eng.state.positions.shape
        assert "config" in meta


class TestStatistics:
    def test_populated(self):
        eng = SimulationEngine(small_config())
        eng.initialize()
        eng.run(num_steps=10)
        st = eng.statistics
        assert st.total_steps == 10
        assert st.particle_updates_per_second > 0
        assert st.current_scale_factor > 0


class TestMeshEngine:
    """Engine-level multi-chip support (compute.mesh.enabled) on the
    virtual 8-device CPU mesh."""

    def _mesh_config(self, solver="direct"):
        cfg = small_config(n=1024, solver=solver)
        cfg.compute.mesh.enabled = True
        cfg.compute.mesh.migrate_capacity_factor = 1.5
        return cfg

    def test_sharded_run_matches_physics(self, cpu_devices):
        import numpy as np
        from lambda_cdm_tpu.core.state import random_state
        st0 = random_state(jax.random.PRNGKey(0), 1024, 50.0,
                           scale_factor=0.02)

        # single-device reference
        eng1 = SimulationEngine(small_config(n=1024))
        eng1.initialize(state=st0)
        eng1.run(num_steps=10)
        e1 = eng1.compute_energy()

        # sharded run from the same ICs
        eng8 = SimulationEngine(self._mesh_config())
        eng8.initialize(state=st0)
        assert eng8._mesh is not None
        eng8.run(num_steps=10)
        e8 = eng8.compute_energy()
        # padded rows are inert: physics matches the single-device run
        assert float(e8["total"]) == pytest.approx(float(e1["total"]),
                                                   rel=1e-3)
        # live particle count preserved through migrations
        assert int(jnp.sum(eng8.state.masses > 0)) == 1024

    def test_pm_solver_under_mesh(self, cpu_devices):
        cfg = self._mesh_config(solver="pm")
        cfg.forces.pm_grid_size = 16
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=5)
        assert bool(jnp.all(jnp.isfinite(eng.state.positions)))


class TestAdviceRegressions:
    """Round-1 advisor findings (ADVICE.md): fast-path config threading,
    resume counter carry, orbax load symmetry, adaptive dt wiring."""

    def _fast_config(self, n=512):
        cfg = small_config(n=n, solver="treepm_fast")
        cfg.forces.pm_grid = 16
        cfg.forces.rebucket_every = 4
        return cfg

    def test_fast_path_honors_box_units(self):
        """units.system='box' (H0_internal=0.1): the scale factor must
        advance ~1000x slower than cosmological H0_internal=100 — round 1
        hardcoded 100.0 in the fast path."""
        cfg = self._fast_config()
        eng = SimulationEngine(cfg)
        eng.initialize()
        a0 = float(eng.state.scale_factor)
        eng.step(8)
        da_box = float(eng.state.scale_factor) - a0

        cfg2 = self._fast_config()
        cfg2.units.system = "cosmological"
        cfg2.units.H0_internal = 100.0
        eng2 = SimulationEngine(cfg2)
        eng2.initialize()
        a0 = float(eng2.state.scale_factor)
        eng2.step(8)
        da_cosmo = float(eng2.state.scale_factor) - a0
        assert da_box < 0.01 * da_cosmo

    def test_fast_path_newtonian_freezes_scale_factor(self):
        cfg = self._fast_config()
        cfg.cosmology.model = "Newtonian"
        eng = SimulationEngine(cfg)
        eng.initialize()
        a0 = float(eng.state.scale_factor)
        eng.step(8)
        assert float(eng.state.scale_factor) == pytest.approx(a0)

    def test_fast_resume_keeps_counters(self, tmp_path):
        """load_checkpoint on a treepm_fast engine must not reset
        time/step (round 1 zeroed them in build_fast_state)."""
        cfg = self._fast_config()
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.step(8)
        path = str(tmp_path / "fastck")
        eng.save_checkpoint(path)
        t_saved, s_saved = float(eng.state.time), int(eng.state.step)
        assert s_saved == 8

        eng2 = SimulationEngine(self._fast_config())
        eng2.load_checkpoint(path)
        assert int(eng2.state.step) == s_saved
        assert float(eng2.state.time) == pytest.approx(t_saved)
        eng2.step(4)
        assert int(eng2.state.step) == s_saved + 4

    def test_orbax_checkpoint_roundtrip_via_engine(self, tmp_path):
        """save_checkpoint(orbax) -> load_checkpoint must round-trip
        (round 1 tried to np.load the orbax directory)."""
        cfg = small_config()
        cfg.io.output_format = "orbax"
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=5)
        path = str(tmp_path / "ock")
        out = eng.save_checkpoint(path)
        assert out  # step_XXXXXXXX dir

        cfg2 = small_config()
        cfg2.io.output_format = "orbax"
        eng2 = SimulationEngine(cfg2)
        eng2.load_checkpoint(path)   # parent dir form
        np.testing.assert_array_equal(np.asarray(eng2.state.positions),
                                      np.asarray(eng.state.positions))
        assert int(eng2.state.step) == int(eng.state.step)

    def test_adaptive_dt_active_on_fast_path(self):
        cfg = self._fast_config()
        cfg.integration.adaptive_timestep = True
        cfg.integration.min_timestep = 1e-9
        cfg.integration.max_timestep = 1e-3
        eng = SimulationEngine(cfg)
        eng.initialize()
        dt0 = float(eng._dt)
        eng.run(num_steps=10)
        # limiter produced a finite, clipped dt (and actually ran)
        assert float(eng._dt) <= dt0 + 1e-12
        assert float(eng._dt) >= 1e-9


class TestForceValidation:
    """validation.validate_forces: solver-vs-direct-summation accuracy
    harness (the reference's barnes_hut_test error report,
    examples/barnes_hut_test.cu:191-250, as an engine capability)."""

    def test_direct_solver_near_exact(self):
        cfg = small_config(n=256, solver="direct_reference")
        cfg.validation.validate_forces = True
        cfg.validation.force_samples = 64
        eng = SimulationEngine(cfg)
        eng.initialize()
        assert eng.statistics.force_avg_err < 1e-4
        assert eng.statistics.force_max_err < 1e-3

    def test_treepm_within_tolerance(self):
        cfg = small_config(n=512, solver="treepm")
        cfg.forces.pm_grid_size = 32
        cfg.forces.softening_length = 0.05
        cfg.validation.validate_forces = False
        eng = SimulationEngine(cfg)
        eng.initialize()
        out = eng.validate_force_accuracy(n_sample=128)
        assert out["solver"] == "treepm"
        assert out["n_sample"] == 128
        # split-force recombination: percent-level vs direct summation
        # on the scale-normalized metric (per-target rel error diverges
        # on near-cancellation targets; see tests/test_solvers.py)
        assert out["avg_err"] < 0.05

    def test_fast_path_maps_to_stateless_solver(self):
        cfg = small_config(n=512, solver="treepm_fast")
        cfg.forces.pm_grid_size = 32
        cfg.forces.softening_length = 0.05
        eng = SimulationEngine(cfg)
        eng.initialize()
        out = eng.validate_force_accuracy(n_sample=64)
        assert out["solver"] == "treepm"
        assert np.isfinite(out["avg_rel_err"])

    def test_zero_mass_padding_excluded_from_targets(self):
        cfg = small_config(n=128, solver="direct_reference")
        cfg.validation.check_initial_conditions = False  # padding rows
        eng = SimulationEngine(cfg)
        st = random_state(jax.random.PRNGKey(0), 128,
                          cfg.particles.box_size)
        # kill the last 16 particles (padding convention: mass == 0)
        st = st.replace(masses=st.masses.at[-16:].set(0.0))
        eng.initialize(st)
        out = eng.validate_force_accuracy(n_sample=1024)
        assert out["n_sample"] == 112       # only live targets sampled


class TestFiniteGuard:
    def test_nan_positions_raise_in_run(self):
        cfg = small_config(n=128)
        cfg.validation.check_finite = True
        cfg.validation.check_initial_conditions = False
        eng = SimulationEngine(cfg)
        eng.initialize()
        bad = eng.state.replace(
            positions=eng.state.positions.at[0, 0].set(jnp.nan))
        eng.state = bad
        with pytest.raises(FloatingPointError, match="non-finite"):
            eng.run(num_steps=5)

    def test_finite_run_unaffected(self):
        cfg = small_config(n=128)
        cfg.validation.check_finite = True
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=5)
        assert eng.lifecycle == LifecycleState.FINISHED


class TestDetailedTiming:
    def test_phase_timers_populated(self):
        """profiling.detailed_timing splits chunk wall time into
        force/integration via a once-measured standalone force eval
        (the reference reserved these SimulationStatistics fields and
        never populated them, simulation_engine.cpp:267-273)."""
        cfg = small_config(n=128)
        cfg.profiling.detailed_timing = True
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=10)
        st = eng.statistics
        assert st.force_time_s > 0
        assert st.integration_time_s >= 0
        assert st.analysis_time_s >= 0
        assert st.force_time_s + st.integration_time_s \
            <= st.total_time_s + 1e-6
        assert st.compute_time_s > 0

    def test_no_misattribution_without_detailed_timing(self):
        """With detailed_timing off there is no force-eval measurement:
        the split fields must stay 0 (not absorb the whole chunk), and
        compute_time_s still records the true stepping wall time."""
        cfg = small_config(n=128)
        cfg.profiling.detailed_timing = False
        eng = SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=5)
        st = eng.statistics
        assert st.force_time_s == 0.0
        assert st.integration_time_s == 0.0
        assert st.compute_time_s > 0
