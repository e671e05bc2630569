"""Multi-device tests on the 8-device virtual CPU mesh: ring direct solver,
sharded PM, particle migration, ghost exchange, load metrics.

This is the multi-node test coverage the reference never had (SURVEY.md
section 4: 'Multi-node is never tested at all').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.direct import direct_accelerations
from lambda_cdm_tpu.parallel.mesh import (SHARD_AXIS, make_mesh,
                                          particle_sharding, shard_state)
from lambda_cdm_tpu.parallel import exchange as ex
from lambda_cdm_tpu.parallel import sharded as sh


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(8)


@pytest.fixture(scope="module")
def cloud():
    key = jax.random.PRNGKey(0)
    n, box = 1024, 50.0
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.5,
                           maxval=2.0)
    return pos, m, box


class TestRingDirect:
    def test_matches_single_device(self, mesh, cloud):
        pos, m, box = cloud
        ref = direct_accelerations(pos, m, box, 0.1)
        acc = sh.ring_direct_accelerations(
            pos, m, box_size=box, softening=0.1, mesh=mesh)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_sharding_layout(self, mesh, cloud):
        pos, m, box = cloud
        acc = sh.ring_direct_accelerations(
            pos, m, box_size=box, softening=0.1, mesh=mesh)
        assert acc.sharding.is_equivalent_to(
            particle_sharding(mesh), acc.ndim)

    def test_energy_psum(self, mesh, cloud):
        pos, m, box = cloud
        vel = 0.1 * jax.random.normal(jax.random.PRNGKey(2), pos.shape)
        e = sh.sharded_energy(pos, vel, m, box_size=box, softening=0.1,
                              g_const=1.0, mesh=mesh)
        from lambda_cdm_tpu.forces.direct import (kinetic_energy,
                                                  potential_energy)
        ke_ref = float(kinetic_energy(vel, m))
        pe_ref = float(potential_energy(pos, m, box, 0.1))
        assert float(e["kinetic"]) == pytest.approx(ke_ref, rel=1e-4)
        assert float(e["potential"]) == pytest.approx(pe_ref, rel=1e-3)


class TestShardedPM:
    def test_matches_single_device(self, mesh, cloud):
        pos, m, box = cloud
        from lambda_cdm_tpu.forces.pm import pm_accelerations
        ref = pm_accelerations(pos, m, 32, box)
        acc = sh.sharded_pm_accelerations(pos, m, 32, box, mesh=mesh)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


class TestMigration:
    def test_owner_assignment(self):
        box, n_dev = 80.0, 8
        pos = jnp.array([[5.0, 0, 0], [15.0, 0, 0], [79.9, 0, 0]])
        own = ex.find_owner(pos, box, n_dev)
        assert list(np.asarray(own)) == [0, 1, 7]

    def test_round_trip_conservation(self, mesh, cloud):
        pos, m, box = cloud
        vel = jnp.ones_like(pos)
        # 1.5x local-row headroom absorbs slab-occupancy fluctuations
        pos_p, vel_p, m_p = ex.pad_particles(pos, vel, m, n_dev=8,
                                             factor=1.5)
        p2, v2, m2, ovf = ex.migrate_particles(
            pos_p, vel_p, m_p, box_size=box, capacity=64, mesh=mesh)
        assert int(ovf) == 0
        # total mass conserved
        assert float(jnp.sum(m2)) == pytest.approx(float(jnp.sum(m)),
                                                   rel=1e-5)
        # every live particle now sits in its owner's slab
        live = np.asarray(m2) > 0
        x = np.asarray(p2)[live, 0]
        # local rows i belong to device i // (N_alloc/8)
        n_loc = pos_p.shape[0] // 8
        dev = np.repeat(np.arange(8), n_loc)[live]
        slab = box / 8
        assert np.all((x >= dev * slab) & (x < (dev + 1) * slab))

    def test_overflow_detected(self, mesh):
        # all particles in one slab, tiny capacity
        n = 1024
        pos = jnp.concatenate([
            jnp.full((n, 1), 1.0),
            jax.random.uniform(jax.random.PRNGKey(0), (n, 2), maxval=50.0),
        ], axis=1)
        m = jnp.ones((n,))
        vel = jnp.zeros_like(pos)
        p2, v2, m2, ovf = ex.migrate_particles(
            pos, vel, m, box_size=50.0, capacity=8, mesh=mesh)
        assert int(ovf) > 0

    def test_velocities_travel_with_particles(self, mesh, cloud):
        pos, m, box = cloud
        vel = pos * 2.0   # recognizable velocity per particle
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        p2, v2, m2, _ = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=64, mesh=mesh)
        live = np.asarray(m2) > 0
        np.testing.assert_allclose(np.asarray(v2)[live],
                                   2.0 * np.asarray(p2)[live], rtol=1e-6)


class TestGhosts:
    def test_ghost_positions_near_faces(self, mesh, cloud):
        pos, m, box = cloud
        # re-home particles first so slab ownership matches rows
        vel = jnp.zeros_like(pos)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        p2, v2, m2, _ = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=64, mesh=mesh)
        width = 1.0
        gpos, gmass, ovf = ex.exchange_ghosts(
            p2, m2, box_size=box, ghost_width=width, capacity=64, mesh=mesh)
        assert int(ovf) == 0
        # each device's ghosts lie within `width` of its slab faces (mod box)
        slab = box / 8
        g = np.asarray(gpos).reshape(8, -1, 3)
        gm = np.asarray(gmass).reshape(8, -1)
        for d in range(8):
            live = gm[d] > 0
            if not live.any():
                continue
            x = g[d][live, 0]
            lo, hi = d * slab, (d + 1) * slab
            dist_lo = np.minimum(np.abs(lo - x), box - np.abs(lo - x))
            dist_hi = np.minimum(np.abs(x - hi), box - np.abs(x - hi))
            assert np.all((dist_lo <= width + 1e-5)
                          | (dist_hi <= width + 1e-5))

    def test_ghost_count_sane(self, mesh, cloud):
        pos, m, box = cloud
        vel = jnp.zeros_like(pos)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        p2, v2, m2, _ = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=64, mesh=mesh)
        width = 2.0
        gpos, gmass, ovf = ex.exchange_ghosts(
            p2, m2, box_size=box, ghost_width=width, capacity=64, mesh=mesh)
        n_ghost = int(jnp.sum(gmass > 0))
        # expected fraction ~ 2*width/slab per device
        expected = 1024 * 2 * width / (box / 8) / 8 * 8
        assert 0 < n_ghost < 3 * expected


class TestLoadBalance:
    def test_uniform_is_balanced(self, mesh, cloud):
        pos, m, box = cloud
        vel = jnp.zeros_like(pos)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        p2, v2, m2, _ = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=64, mesh=mesh)
        imb = ex.load_imbalance(m2, mesh=mesh)
        assert float(imb) < 0.5

    def test_skewed_is_imbalanced(self, mesh):
        n = 1024
        # 90% of particles in slab 0
        x = jnp.where(jnp.arange(n) < 900, 2.0, 25.0)
        pos = jnp.stack([x, jnp.full((n,), 10.0), jnp.full((n,), 10.0)], -1)
        m = jnp.ones((n,))
        vel = jnp.zeros_like(pos)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=2.0)
        p2, v2, m2, ovf = ex.migrate_particles(
            pos, vel, m, box_size=50.0, capacity=128, mesh=mesh)
        imb = ex.load_imbalance(m2, mesh=mesh)
        assert float(imb) > 0.5


class TestShardState:
    def test_state_sharding(self, mesh):
        from lambda_cdm_tpu.core.state import random_state
        st = random_state(jax.random.PRNGKey(0), 1024, 50.0)
        sst = shard_state(st, mesh)
        assert sst.positions.sharding.is_equivalent_to(
            particle_sharding(mesh), 2)
        np.testing.assert_allclose(np.asarray(sst.positions),
                                   np.asarray(st.positions))


class TestDistributedFFT:
    """Explicit slab-transpose FFT vs single-device jnp.fft."""

    def test_forward_matches_rfftn(self, mesh):
        from lambda_cdm_tpu.parallel.fft import distributed_rfftn
        ng = 32
        grid = jax.random.normal(jax.random.PRNGKey(0), (ng, ng, ng))
        ref = jnp.fft.rfftn(grid)
        out_t = distributed_rfftn(grid, mesh=mesh)   # [ky, kx, kz]
        out = jnp.moveaxis(out_t, 0, 1)              # -> [kx, ky, kz]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_roundtrip(self, mesh):
        from lambda_cdm_tpu.parallel.fft import (distributed_irfftn,
                                                 distributed_rfftn)
        ng = 32
        grid = jax.random.normal(jax.random.PRNGKey(1), (ng, ng, ng))
        gk = distributed_rfftn(grid, mesh=mesh)
        back = distributed_irfftn(gk, ng=ng, mesh=mesh)
        np.testing.assert_allclose(np.asarray(back), np.asarray(grid),
                                   rtol=1e-4, atol=1e-4)

    def test_poisson_matches_single_device(self, mesh):
        from lambda_cdm_tpu.parallel.fft import distributed_poisson_solve
        from lambda_cdm_tpu.forces.pm import poisson_greens_function
        ng, box = 32, 50.0
        rho = jax.random.normal(jax.random.PRNGKey(2), (ng, ng, ng))
        rho = rho - jnp.mean(rho)
        green = poisson_greens_function(ng, box, deconvolve_cic=False)
        ref = jnp.fft.irfftn(green * jnp.fft.rfftn(rho), s=(ng, ng, ng))
        out = distributed_poisson_solve(rho, ng=ng, box_size=box, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


class TestAdaptiveBalance:
    def test_adaptive_bounds_balance_skewed_load(self, mesh):
        """90% of particles in one slab: adaptive bounds re-balance what
        uniform slabs cannot (the LoadBalancer::rebalance capability)."""
        n = 2048
        key = jax.random.PRNGKey(0)
        # clustered x around 5.0, tail uniform
        x = jnp.where(jnp.arange(n) < 1800,
                      jnp.clip(5.0 + jax.random.normal(key, (n,)), 0, 49.9),
                      jax.random.uniform(jax.random.PRNGKey(1), (n,),
                                         maxval=50.0))
        pos = jnp.stack([x, jnp.full((n,), 10.0), jnp.full((n,), 10.0)], -1)
        m = jnp.ones((n,))
        vel = jnp.zeros_like(pos)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=2.0)

        # uniform slabs: badly imbalanced
        p_u, v_u, m_u, _ = ex.migrate_particles(
            pos, vel, m, box_size=50.0, capacity=pos.shape[0] // 8,
            mesh=mesh)
        imb_uniform = float(ex.load_imbalance(m_u, mesh=mesh))

        # adaptive bounds: balanced
        bounds = ex.adaptive_slab_bounds(pos, m, 8, 50.0)
        assert float(bounds[0]) == 0.0 and float(bounds[-1]) == 50.0
        assert bool(jnp.all(jnp.diff(bounds) >= 0))
        p_a, v_a, m_a, ovf = ex.migrate_particles(
            pos, vel, m, box_size=50.0, capacity=pos.shape[0] // 8,
            mesh=mesh, bounds=bounds)
        imb_adaptive = float(ex.load_imbalance(m_a, mesh=mesh))
        assert int(ovf) == 0
        assert imb_adaptive < 0.35 < imb_uniform
        # mass conserved
        assert float(jnp.sum(m_a)) == pytest.approx(float(jnp.sum(m)),
                                                    rel=1e-5)

    def test_find_owner_with_bounds(self):
        bounds = jnp.array([0.0, 10.0, 30.0, 50.0])
        pos = jnp.array([[5.0, 0, 0], [15.0, 0, 0], [45.0, 0, 0],
                         [10.0, 0, 0]])
        own = ex.find_owner(pos, 50.0, 3, bounds=bounds)
        assert list(np.asarray(own)) == [0, 1, 2, 1]
