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


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

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


class TestEmigrantMigration:
    """Scalable emigrant-only exchange (VERDICT round-1 item 4): small
    buffers, stayers never move, overflow invalidates the result."""

    def _homed_cloud(self, mesh, n=1024, box=50.0, seed=0):
        key = jax.random.PRNGKey(seed)
        pos = jax.random.uniform(key, (n, 3), maxval=box)
        m = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n,),
                               minval=0.5, maxval=2.0)
        vel = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        ps = particle_sharding(mesh)
        pos, vel, m = (jax.device_put(pos, ps), jax.device_put(vel, ps),
                       jax.device_put(m, ps))
        n_loc = pos.shape[0] // 8
        pos, vel, m, ovf = ex.migrate_particles(pos, vel, m, box_size=box,
                                                capacity=n_loc, mesh=mesh)
        assert int(ovf) == 0
        return pos, vel, m, box

    def test_steady_state_small_capacity(self, mesh):
        """After homing, a small perturbation migrates with capacity far
        below n_loc (the point of the emigrant-only design)."""
        pos, vel, m, box = self._homed_cloud(mesh)
        # nudge ~10% of particles across a slab face
        key = jax.random.PRNGKey(9)
        kick = jax.random.uniform(key, (pos.shape[0],)) < 0.1
        newx = jnp.mod(pos[:, 0] + jnp.where(kick, box / 8.0, 0.0), box)
        pos2 = pos.at[:, 0].set(newx)
        p3, v3, m3, ovf = ex.migrate_particles_emigrant(
            pos2, vel, m, box_size=box, capacity=32, mesh=mesh)
        assert int(ovf) == 0
        # conservation: same multiset of live particles
        def live_sorted(p, mm):
            arr = np.asarray(p)[np.asarray(mm) > 0]
            return arr[np.lexsort(arr.T)]
        np.testing.assert_allclose(live_sorted(p3, m3),
                                   live_sorted(pos2, m),  atol=0)
        assert float(jnp.sum(m3)) == pytest.approx(float(jnp.sum(m)))
        # every live row is on its owning slab now
        owner = ex.find_owner(p3, box, 8)
        slab_of_row = jnp.repeat(jnp.arange(8), p3.shape[0] // 8)
        live = np.asarray(m3) > 0
        assert np.all(np.asarray(owner)[live]
                      == np.asarray(slab_of_row)[live])

    def test_velocities_travel(self, mesh):
        pos, vel, m, box = self._homed_cloud(mesh, seed=5)
        shift = jnp.mod(pos[:, 0] + box / 8.0, box)
        pos2 = pos.at[:, 0].set(shift)   # everyone moves one slab right
        n_loc = pos.shape[0] // 8
        p3, v3, m3, ovf = ex.migrate_particles_emigrant(
            pos2, vel, m, box_size=box, capacity=n_loc, mesh=mesh)
        assert int(ovf) == 0
        # (pos, vel) pairs preserved
        def pairs(p, v, mm):
            p, v, mm = map(np.asarray, (p, v, mm))
            sel = mm > 0
            arr = np.concatenate([p[sel], v[sel]], axis=1)
            return arr[np.lexsort(arr.T)]
        np.testing.assert_allclose(pairs(p3, v3, m3), pairs(pos2, vel, m),
                                   atol=0)

    def test_overflow_detected_and_counted(self, mesh):
        pos, vel, m, box = self._homed_cloud(mesh)
        shift = jnp.mod(pos[:, 0] + box / 8.0, box)
        pos2 = pos.at[:, 0].set(shift)   # ~n_loc emigrants per device
        _, _, _, ovf = ex.migrate_particles_emigrant(
            pos2, vel, m, box_size=box, capacity=8, mesh=mesh)
        assert int(ovf) > 0


class TestEngineLoadBalance:
    def test_clustered_run_keeps_imbalance_bounded(self, cpu_devices):
        """Clustered ICs + adaptive bounds keep live-count imbalance under
        the reference's 20% trigger (cluster_comm.cpp:314-349)."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        n, box = 2048, 50.0
        key = jax.random.PRNGKey(2)
        # 80% of particles clustered in one slab, 20% uniform
        k1, k2 = jax.random.split(key)
        clust = jax.random.uniform(k1, (n * 4 // 5, 3),
                                   minval=jnp.array([1.0, 0.0, 0.0]),
                                   maxval=jnp.array([6.0, box, box]))
        unif = jax.random.uniform(k2, (n - clust.shape[0], 3), maxval=box)
        pos = jnp.concatenate([clust, unif])
        vel = jnp.zeros_like(pos)
        mass = jnp.ones((n,))

        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = box
        cfg.forces.type = "direct"
        cfg.forces.softening_length = 0.5
        cfg.time.initial_timestep = 1e-5
        cfg.time.final_time = 1e9
        cfg.cosmology.initial_redshift = 49.0
        cfg.compute.mesh.enabled = True
        cfg.compute.mesh.load_balancing = True
        cfg.simulation.output_frequency = 2
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""
        eng = SimulationEngine(cfg)
        eng.initialize(state=make_state(pos, vel, mass, scale_factor=0.02))
        eng.run(num_steps=4)
        imb = float(ex.load_imbalance(eng.state.masses, mesh=eng._mesh))
        assert imb <= 0.2 + 1e-6, f"imbalance {imb} exceeds trigger"
        # nothing lost
        assert int(jnp.sum(eng.state.masses > 0)) == n
