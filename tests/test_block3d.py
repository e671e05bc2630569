"""3D block decomposition tests on a (2,2,2) virtual CPU mesh.

Validates the full 3D Cartesian topology the reference builds with
MPI_Dims_create/MPI_Cart_create + 26-neighbor ghost exchange
(domain_decomposition.cpp:10-112, cluster_comm.cpp:25-88): 3D particle
migration (ownership by block), dimension-ordered halo exchange, and the
block-local short-range against a dense oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.direct import min_image
from lambda_cdm_tpu.forces.treepm import short_range_factor
from lambda_cdm_tpu.parallel import sharded_treepm as stp
from lambda_cdm_tpu.parallel.exchange import (find_owner_3d,
                                              migrate_particles,
                                              pad_particles)
from lambda_cdm_tpu.parallel.mesh import make_mesh3d, particle_sharding

pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

AX = ("shx", "shy", "shz")
DIMS = (2, 2, 2)


@pytest.fixture(scope="module")
def mesh3(cpu_devices):
    return make_mesh3d(DIMS)


@pytest.fixture(scope="module")
def cloud3(mesh3):
    """Random particles, padded + migrated to their owning 3D blocks."""
    key = jax.random.PRNGKey(0)
    n, box = 2048, 100.0
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.5,
                           maxval=2.0)
    vel = jnp.zeros_like(pos)
    pos, vel, m = pad_particles(pos, vel, m, n_dev=8, factor=1.5)
    ps = particle_sharding(mesh3, AX)
    pos, vel, m = (jax.device_put(pos, ps), jax.device_put(vel, ps),
                   jax.device_put(m, ps))
    n_loc = pos.shape[0] // 8
    pos, vel, m, ovf = migrate_particles(pos, vel, m, box_size=box,
                                         capacity=n_loc, mesh=mesh3,
                                         axis_name=AX)
    assert int(ovf) == 0
    return pos, m, box


def _dense_short_range(pos, m, box, rs, softening):
    """Dense S(r)-truncated pairwise oracle (erfc split, all pairs)."""
    dx = min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(dx * dx, axis=-1) + softening ** 2
    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    w = m[None, :] * short_range_factor(r, rs) * (inv_r * inv_r * inv_r)
    acc = jnp.sum(w[..., None] * dx, axis=1)
    return jnp.where((m > 0)[:, None], acc, 0.0)


class TestPlan3d:
    def test_divisible_by_every_axis(self):
        plan = stp.sharded_treepm_plan_3d(4096, 100.0, 64, (2, 2, 2))
        assert plan is not None
        for d in (2, 2, 2):
            assert plan["nc"] % d == 0
        assert 100.0 / plan["nc"] >= plan["r_cut"]

    def test_none_for_tiny_box(self):
        assert stp.sharded_treepm_plan_3d(512, 10.0, 16, (2, 2, 2)) is None

    def test_anisotropic_dims(self):
        plan = stp.sharded_treepm_plan_3d(4096, 100.0, 64, (4, 2, 1))
        assert plan is not None
        assert plan["nc"] % 4 == 0


class TestMigration3d:
    def test_ownership_after_migration(self, mesh3, cloud3):
        pos, m, box = cloud3
        n_loc = pos.shape[0] // 8
        pos_h = np.asarray(pos)
        m_h = np.asarray(m)
        owner = np.asarray(find_owner_3d(jnp.asarray(pos_h), box, DIMS))
        for d in range(8):
            rows = slice(d * n_loc, (d + 1) * n_loc)
            live = m_h[rows] > 0
            assert np.all(owner[rows][live] == d)
        # no particles lost
        assert int((m_h > 0).sum()) == 2048


class TestHalo3d:
    def test_matches_dense_oracle(self, mesh3, cloud3):
        pos, m, box = cloud3
        pm_grid = 64
        rs = 1.25 * box / pm_grid
        plan = stp.sharded_treepm_plan_3d(2048, box, pm_grid, DIMS)
        assert plan is not None
        a_halo, ovf = stp.halo_short_range_accelerations_3d(
            pos, m, box_size=box, nc=plan["nc"],
            capacity=plan["capacity"], rs=rs, softening=0.1, mesh=mesh3)
        assert int(ovf) == 0
        a_ref = _dense_short_range(pos, m, box, rs, 0.1)
        a_halo, a_ref = np.asarray(a_halo), np.asarray(a_ref)
        # 27-cell neighborhood covers every pair with S above the split
        # tail erfc(2.25) ~ 1.5e-3 (same bound as the 1D halo test)
        scale = np.abs(a_ref).max()
        np.testing.assert_allclose(a_halo, a_ref, atol=2e-3 * scale)

    def test_full_treepm_matches_single_chip(self, mesh3, cloud3):
        from lambda_cdm_tpu.forces.treepm import treepm_accelerations
        pos, m, box = cloud3
        pm_grid = 64
        acc3, diag = stp.sharded_treepm_accelerations(
            pos, m, box_size=box, pm_grid=pm_grid, softening=0.1,
            g_const=43.007, mesh=mesh3, axis_name=AX,
            return_diagnostics=True)
        assert int(diag["overflow"]) == 0
        acc1 = treepm_accelerations(pos, m, box, pm_grid=pm_grid,
                                    softening=0.1, g_const=43.007)
        acc3, acc1 = np.asarray(acc3), np.asarray(acc1)
        live = np.asarray(m) > 0
        scale = np.abs(acc1[live]).max()
        np.testing.assert_allclose(acc3[live], acc1[live],
                                   atol=5e-3 * scale)


class TestEngine3dMesh:
    def test_engine_runs_on_3d_mesh(self, mesh3):
        """compute.mesh.axes = {shx, shy, shz} drives the generic run
        loop through 3D migration + the 26-neighbor halo TreePM."""
        import lambda_cdm_tpu as lc
        from lambda_cdm_tpu.core.config import SimulationConfig
        cfg = SimulationConfig()
        cfg.particles.num_particles = 4096   # 16^3 for LPT ICs
        cfg.particles.box_size = 100.0
        cfg.forces.type = "treepm"
        cfg.forces.pm_grid_size = 64
        cfg.forces.softening_length = 0.5
        cfg.compute.mesh.enabled = True
        cfg.compute.mesh.axes = {"shx": 2, "shy": 2, "shz": 2}
        cfg.cosmology.initial_redshift = 24.0
        cfg.cosmology.final_redshift = 0.0
        cfg.simulation.time_step = 2e-5
        eng = lc.SimulationEngine(cfg)
        eng.initialize()
        eng.run(num_steps=4)
        st = eng.state
        live = np.asarray(st.masses) > 0
        assert live.sum() == 4096
        assert np.all(np.isfinite(np.asarray(st.positions)))
        e = eng.compute_energy()
        assert np.isfinite(float(e["total"]))
