"""Multi-chip TreePM short-range tests on the 8-device virtual CPU mesh.

Validates the halo-exchange cell-bucket short-range (the reference's
ghost-exchange -> local-force pipeline, cluster_comm.cpp:166-216) against
the exact ring oracle and the single-chip TreePM solver: mesh mode must
no longer degrade to PM-only (VERDICT.md round-1 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.treepm import treepm_accelerations
from lambda_cdm_tpu.parallel.mesh import make_mesh
from lambda_cdm_tpu.parallel import sharded_treepm as stp


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(8)


@pytest.fixture(scope="module")
def cloud(mesh):
    """Random particles, PADDED + MIGRATED to their owning x-slabs (the
    halo short-range consumes slab-resident rows, like the engine after
    its init-time migration)."""
    from lambda_cdm_tpu.parallel.exchange import (migrate_particles,
                                                  pad_particles)
    from lambda_cdm_tpu.parallel.mesh import particle_sharding
    key = jax.random.PRNGKey(0)
    n, box = 2048, 100.0
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.5,
                           maxval=2.0)
    vel = jnp.zeros_like(pos)
    pos, vel, m = pad_particles(pos, vel, m, n_dev=8, factor=1.5)
    ps = particle_sharding(mesh)
    pos, m = jax.device_put(pos, ps), jax.device_put(m, ps)
    vel = jax.device_put(vel, ps)
    n_loc = pos.shape[0] // 8
    pos, vel, m, ovf = migrate_particles(pos, vel, m, box_size=box,
                                         capacity=n_loc, mesh=mesh)
    assert int(ovf) == 0
    return pos, m, box


class TestPlan:
    def test_plan_divisible(self):
        plan = stp.sharded_treepm_plan(4096, 100.0, 64, 8)
        assert plan is not None
        assert plan["nc"] % 8 == 0
        assert 100.0 / plan["nc"] >= plan["r_cut"]

    def test_plan_none_for_tiny_box(self):
        # 16-grid on 8 devices: nc_max = floor(16/(4.5*1.25)) = 2 < 8
        assert stp.sharded_treepm_plan(512, 10.0, 16, 8) is None


class TestHaloShortRange:
    def test_matches_ring_oracle(self, mesh, cloud):
        """Halo cell-bucket short-range == exact ring S(r) pairwise."""
        pos, m, box = cloud
        pm_grid = 64
        rs = 1.25 * box / pm_grid
        plan = stp.sharded_treepm_plan(pos.shape[0], box, pm_grid, 8)
        assert plan is not None
        a_halo, ovf = stp.halo_short_range_accelerations(
            pos, m, box_size=box, nc=plan["nc"], capacity=plan["capacity"],
            rs=rs, softening=0.1, mesh=mesh)
        a_ring = stp.ring_short_range_accelerations(
            pos, m, box_size=box, rs=rs, softening=0.1, mesh=mesh)
        assert int(ovf) == 0
        a_halo, a_ring = np.asarray(a_halo), np.asarray(a_ring)
        # ring sums ALL pairs; halo only the 27-cell neighborhood. With
        # cells >= r_cut = 4.5 rs every pair with S > erfc(2.25) ~ 1.5e-3
        # is covered -> relative error bounded by the split tail
        scale = np.abs(a_ring).max()
        np.testing.assert_allclose(a_halo, a_ring, atol=2e-3 * scale)

    def test_zero_mass_rows_inert(self, mesh, cloud):
        pos, m, box = cloud
        pm_grid = 64
        rs = 1.25 * box / pm_grid
        plan = stp.sharded_treepm_plan(pos.shape[0], box, pm_grid, 8)
        m_pad = m.at[::4].set(0.0)
        a, ovf = stp.halo_short_range_accelerations(
            pos, m_pad, box_size=box, nc=plan["nc"],
            capacity=plan["capacity"], rs=rs, softening=0.1, mesh=mesh)
        # dead rows get zero acceleration (bucketed to the drop cell)
        a = np.asarray(a)
        assert np.all(a[::4] == 0.0)
        assert int(ovf) == 0

    def test_overflow_counted_not_dropped(self, mesh, cloud):
        pos, m, box = cloud
        plan = stp.sharded_treepm_plan(pos.shape[0], box, 64, 8)
        a, ovf = stp.halo_short_range_accelerations(
            pos, m, box_size=box, nc=plan["nc"], capacity=8,
            rs=1.25 * box / 64, softening=0.1, mesh=mesh)
        assert int(ovf) > 0
        assert bool(jnp.all(jnp.isfinite(a)))


class TestShardedTreePM:
    def test_matches_single_chip_treepm(self, mesh, cloud):
        """Mesh-mode TreePM == single-chip TreePM (VERDICT item 2 bar:
        <= 1e-4 relative force error on the 8-CPU mesh)."""
        pos, m, box = cloud
        pm_grid = 64
        a_multi = stp.sharded_treepm_accelerations(
            pos, m, box_size=box, pm_grid=pm_grid, softening=0.1,
            g_const=43.0, mesh=mesh)
        a_single = treepm_accelerations(
            pos, m, box, pm_grid=pm_grid, softening=0.1, g_const=43.0)
        a_multi, a_single = np.asarray(a_multi), np.asarray(a_single)
        scale = np.abs(a_single).max()
        np.testing.assert_allclose(a_multi, a_single, atol=1e-4 * scale)

    def test_ring_fallback_geometry(self, mesh):
        """Degenerate geometry (fewer than n_dev r_cut cells per axis)
        falls back to the exact ring short-range and still matches the
        single-chip TreePM (which at nc=5 uses its own cell lattice)."""
        key = jax.random.PRNGKey(3)
        box, pm_grid = 100.0, 32   # nc_max = floor(32/5.625) = 5 < 8
        pos = jax.random.uniform(key, (512, 3), maxval=box)
        m = jnp.ones((512,))
        acc, diag = stp.sharded_treepm_accelerations(
            pos, m, box_size=box, pm_grid=pm_grid, softening=0.5,
            g_const=1.0, mesh=mesh, return_diagnostics=True)
        assert diag["plan"] is None
        assert bool(jnp.all(jnp.isfinite(acc)))
        a_single = treepm_accelerations(pos, m, box, pm_grid=pm_grid,
                                        softening=0.5, g_const=1.0)
        scale = float(jnp.abs(a_single).max())
        # ring sums every pair; the single-chip cell version only the
        # 27-neighborhood -> differences bounded by the split tail
        np.testing.assert_allclose(np.asarray(acc), np.asarray(a_single),
                                   atol=2e-3 * scale)


class TestMeshEngineTreePM:
    def test_engine_mesh_treepm_runs_and_matches(self, cpu_devices):
        """Engine in mesh mode with forces.type=treepm must use the real
        sharded TreePM (round 1 warned and fell back to PM-only)."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        def config():
            cfg = SimulationConfig()
            cfg.particles.num_particles = 1024
            cfg.particles.box_size = 100.0
            cfg.particles.initial_conditions.type = "uniform_random"
            cfg.forces.type = "treepm"
            cfg.forces.pm_grid = 64
            cfg.forces.softening_length = 0.5
            cfg.time.initial_timestep = 1e-4
            cfg.time.final_time = 1e9
            cfg.cosmology.initial_redshift = 49.0
            cfg.simulation.output_frequency = 4
            cfg.simulation.checkpoint_frequency = 0
            cfg.profiling.output_file = ""
            return cfg

        key = jax.random.PRNGKey(11)
        pos = jax.random.uniform(key, (1024, 3), maxval=100.0)
        vel = jnp.zeros((1024, 3))
        mass = jnp.ones((1024,))

        cfg_m = config()
        cfg_m.compute.mesh.enabled = True
        eng_m = SimulationEngine(cfg_m)
        eng_m.initialize(state=make_state(pos, vel, mass, scale_factor=0.02))
        eng_m.run(num_steps=8)

        cfg_s = config()
        eng_s = SimulationEngine(cfg_s)
        eng_s.initialize(state=make_state(pos, vel, mass, scale_factor=0.02))
        eng_s.run(num_steps=8)

        # mesh state is padded + migrated: compare sorted live particles
        def live_sorted(st):
            p = np.asarray(st.positions)[np.asarray(st.masses) > 0]
            return p[np.lexsort(p.T)]

        pm = live_sorted(eng_m.state)
        ps = live_sorted(eng_s.state)
        assert pm.shape == ps.shape
        np.testing.assert_allclose(pm, ps, atol=5e-4)
