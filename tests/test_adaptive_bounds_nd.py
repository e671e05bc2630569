"""Hierarchical load-adaptive 3D block decomposition
(parallel/exchange.adaptive_bounds_nd + find_owner_3d bounds): the
capability of the reference's Morton-greedy cell-to-rank assignment
(domain_decomposition.cpp:114-264) on block meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.parallel import exchange as ex
from lambda_cdm_tpu.parallel.mesh import make_mesh3d

AX3 = ("shx", "shy", "shz")


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

def _clustered(key, n, box, frac=0.8):
    """frac of particles in a tight off-center 3D blob (non-product after
    mixing with the uniform background), rest uniform."""
    k1, k2 = jax.random.split(key)
    nb = int(n * frac)
    blob = jnp.array([0.15, 0.6, 0.3]) * box + \
        0.03 * box * jax.random.normal(k1, (nb, 3))
    unif = jax.random.uniform(k2, (n - nb, 3), maxval=box)
    return jnp.mod(jnp.concatenate([blob, unif]), box)


class TestAdaptiveBoundsNd:
    def test_balances_clustered_blob(self):
        n, box, dims = 16384, 100.0, (2, 2, 2)
        pos = _clustered(jax.random.PRNGKey(0), n, box)
        m = jnp.ones((n,))
        bounds = ex.adaptive_bounds_nd(pos, m, dims, box)
        owner = ex.find_owner_3d(pos, box, dims, bounds=bounds)
        counts = np.bincount(np.asarray(owner), minlength=8)
        imb = (counts.max() - counts.min()) / counts.max()
        assert imb < 0.15, f"counts {counts}: imbalance {imb:.3f}"
        # uniform blocks for contrast: the blob hot-spots one device
        owner_u = ex.find_owner_3d(pos, box, dims)
        cu = np.bincount(np.asarray(owner_u), minlength=8)
        assert (cu.max() - cu.min()) / cu.max() > 0.5

    def test_bounds_structure(self):
        n, box, dims = 4096, 50.0, (2, 4, 1)
        pos = _clustered(jax.random.PRNGKey(1), n, box)
        m = jnp.ones((n,))
        bx, by, bz = ex.adaptive_bounds_nd(pos, m, dims, box)
        assert bx.shape == (3,) and by.shape == (2, 5)
        assert bz.shape == (2, 4, 2)
        np.testing.assert_allclose(np.asarray(bx)[[0, -1]], [0.0, box])
        assert np.all(np.diff(np.asarray(bx)) > 0)
        for row in np.asarray(by):
            assert np.all(np.diff(row) >= 0)
        # dead rows don't skew the histograms
        m2 = m.at[: n // 2].set(0.0)
        bx2, _, _ = ex.adaptive_bounds_nd(pos, m2, dims, box)
        live = np.asarray(pos[n // 2:, 0])
        below = (live < np.asarray(bx2)[1]).mean()
        assert abs(below - 0.5) < 0.05

    def test_migration_with_bounds(self, cpu_devices):
        """migrate_particles on a (2,2,2) mesh with adaptive bounds:
        balanced per-device live counts, owners consistent, no loss."""
        n, box, dims = 4096, 100.0, (2, 2, 2)
        mesh = make_mesh3d(dims)
        pos = _clustered(jax.random.PRNGKey(2), n, box)
        vel = jnp.zeros_like(pos)
        m = jnp.ones((n,))
        # production headroom: balanced counts still jitter around
        # n/n_dev by the histogram-interpolation granularity
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
        n_rows = pos.shape[0]
        bounds = ex.adaptive_bounds_nd(pos, m, dims, box)
        p2, v2, m2, ovf = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=n_rows // 8, mesh=mesh,
            axis_name=AX3, bounds=bounds)
        assert int(ovf) == 0
        assert int(jnp.sum(m2 > 0)) == n
        live = np.asarray(m2 > 0).reshape(8, -1)
        counts = live.sum(axis=1)
        imb = (counts.max() - counts.min()) / counts.max()
        assert imb < 0.15, f"device counts {counts}"
        # every live row landed on its owning device
        owner = np.asarray(ex.find_owner_3d(p2, box, dims, bounds=bounds))
        dev = np.repeat(np.arange(8), n_rows // 8)
        ok = np.asarray(m2 > 0)
        assert np.all(owner[ok] == dev[ok])

    def test_emigrant_migration_with_bounds(self, cpu_devices):
        n, box, dims = 2048, 100.0, (2, 2, 2)
        mesh = make_mesh3d(dims)
        pos = _clustered(jax.random.PRNGKey(3), n, box)
        vel = jnp.zeros_like(pos)
        m = jnp.ones((n,))
        # uniform blocks first: the hot block needs ~80% of all rows,
        # so pad generously (factor 8 -> n rows per device)
        pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=8.0)
        n_rows = pos.shape[0]
        p1, v1, m1, ovf1 = ex.migrate_particles(
            pos, vel, m, box_size=box, capacity=n_rows // 8, mesh=mesh,
            axis_name=AX3)
        assert int(ovf1) == 0
        # then re-home adaptively with the emigrant exchange
        bounds = ex.adaptive_bounds_nd(p1, m1, dims, box)
        p2, v2, m2, ovf = ex.migrate_particles_emigrant(
            p1, v1, m1, box_size=box, capacity=n_rows // 8, mesh=mesh,
            axis_name=AX3, bounds=bounds)
        assert int(ovf) == 0
        assert int(jnp.sum(m2 > 0)) == n
        counts = np.asarray(m2 > 0).reshape(8, -1).sum(axis=1)
        imb = (counts.max() - counts.min()) / counts.max()
        assert imb < 0.15, f"device counts {counts}"


class TestEngineLoadBalance3D:
    def test_clustered_3d_run_keeps_imbalance_bounded(self, cpu_devices):
        """Engine on a (2,2,2) block mesh with a clustered IC: the
        rebalance trigger + adaptive_bounds_nd keep live-count imbalance
        under the 20% threshold across a run with migrations."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        n, box = 2048, 50.0
        pos = _clustered(jax.random.PRNGKey(4), n, box)
        vel = jnp.zeros_like(pos)
        mass = jnp.ones((n,))

        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = box
        cfg.forces.type = "pm"
        cfg.forces.softening_length = 0.5
        cfg.time.initial_timestep = 1e-5
        cfg.time.final_time = 1e9
        cfg.cosmology.initial_redshift = 49.0
        cfg.compute.mesh.enabled = True
        cfg.compute.mesh.axes = {"shx": 2, "shy": 2, "shz": 2}
        cfg.compute.mesh.load_balancing = True
        cfg.simulation.output_frequency = 2
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""
        eng = SimulationEngine(cfg)
        eng.initialize(state=make_state(pos, vel, mass,
                                        scale_factor=0.02))
        eng.run(num_steps=4)
        imb = float(ex.load_imbalance(eng.state.masses, mesh=eng._mesh,
                                      axis_name=AX3))
        assert imb <= 0.2 + 1e-6, f"imbalance {imb} exceeds trigger"
        assert int(jnp.sum(eng.state.masses > 0)) == n
        # and the rows are genuinely HOMED to their adaptive bricks (a
        # failed/stale migration would also look balanced)
        bounds = eng._mesh_bounds
        assert bounds is not None
        owner = np.asarray(ex.find_owner_3d(
            eng.state.positions, box, (2, 2, 2), bounds=bounds))
        nrows = eng.state.positions.shape[0]
        dev = np.repeat(np.arange(8), nrows // 8)
        ok = np.asarray(eng.state.masses > 0)
        assert (owner[ok] == dev[ok]).mean() > 0.95


class TestPairCostBalance:
    """Pair-cost-weighted partitions (VERDICT r3 item 5): short-range
    work scales with sum(occ^2), not live counts, so a clustered rank
    can be count-balanced yet pair-overloaded. The cost-weighted bounds
    must equalize estimated pair cost where count-weighted ones fail
    (the intent of the reference's measured-compute-time balancer,
    cluster_comm.cpp:314-349)."""

    @staticmethod
    def _half_blob(key, n, box):
        """Half the particles in one dense blob, half uniform: count
        and cost balancing maximally disagree."""
        k1, k2 = jax.random.split(key)
        blob = jnp.array([0.3, 0.6, 0.4]) * box + \
            0.04 * box * jax.random.normal(k1, (n // 2, 3))
        unif = jax.random.uniform(k2, (n // 2, 3), maxval=box)
        return jnp.mod(jnp.concatenate([blob, unif]), box)

    def _device_costs(self, pos, m, box, dims, bounds):
        w = np.asarray(ex.pair_cost_weights(pos, m, box))
        owner = np.asarray(ex.find_owner_3d(pos, box, dims,
                                            bounds=bounds))
        return np.bincount(owner, weights=w, minlength=8)

    def test_cost_weighted_bounds_equalize_pair_cost(self):
        n, box, dims = 16384, 100.0, (2, 2, 2)
        pos = self._half_blob(jax.random.PRNGKey(7), n, box)
        m = jnp.ones((n,))
        w = ex.pair_cost_weights(pos, m, box)

        b_cnt = ex.adaptive_bounds_nd(pos, m, dims, box)
        b_cost = ex.adaptive_bounds_nd(pos, m, dims, box, weights=w)

        c_cnt = self._device_costs(pos, m, box, dims, b_cnt)
        c_cost = self._device_costs(pos, m, box, dims, b_cost)
        spread_cnt = (c_cnt.max() - c_cnt.min()) / c_cnt.max()
        spread_cost = (c_cost.max() - c_cost.min()) / c_cost.max()
        # count-balanced bricks are pair-overloaded on the blob ranks
        assert spread_cnt > 0.5, f"scenario too easy: {c_cnt}"
        assert spread_cost < 0.2, \
            f"cost spread {spread_cost:.3f} ({c_cost})"

    def test_weights_zero_on_dead_rows(self):
        n, box = 4096, 50.0
        pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                                 maxval=box)
        m = jnp.ones((n,)).at[: n // 3].set(0.0)
        w = np.asarray(ex.pair_cost_weights(pos, m, box))
        assert np.all(w[: n // 3] == 0.0)
        assert np.all(w[n // 3:] >= 1.0)

    def test_engine_pair_cost_spread_bounded(self, cpu_devices):
        """Engine on (2,2,2) with balance_weight=pair_cost on a
        half-blob IC: the COST spread (not just counts) stays under
        the 20% trigger across chunked migrations."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        n, box = 4096, 50.0
        pos = self._half_blob(jax.random.PRNGKey(9), n, box)
        vel = jnp.zeros_like(pos)
        mass = jnp.ones((n,))

        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = box
        cfg.forces.type = "pm"
        cfg.forces.softening_length = 0.5
        cfg.time.initial_timestep = 1e-5
        cfg.time.final_time = 1e9
        cfg.cosmology.initial_redshift = 49.0
        cfg.compute.mesh.enabled = True
        cfg.compute.mesh.axes = {"shx": 2, "shy": 2, "shz": 2}
        cfg.compute.mesh.load_balancing = True
        cfg.compute.mesh.balance_weight = "pair_cost"
        # cost-equal bricks are count-UNEQUAL by design (blob ranks get
        # few particles, field ranks many): the row budget must cover
        # the count spread that cost balancing trades away
        cfg.compute.mesh.migrate_capacity_factor = 3.0
        cfg.simulation.output_frequency = 2
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""
        cfg.validate()
        eng = SimulationEngine(cfg)
        eng.initialize(state=make_state(pos, vel, mass,
                                        scale_factor=0.02))
        eng.run(num_steps=4)
        w = ex.pair_cost_weights(eng.state.positions, eng.state.masses,
                                 box)
        imb = float(ex.load_imbalance(eng.state.masses, mesh=eng._mesh,
                                      axis_name=AX3, weights=w))
        assert imb <= 0.2 + 1e-6, f"pair-cost spread {imb}"
        assert int(jnp.sum(eng.state.masses > 0)) == n

    def test_bad_balance_weight_rejected(self):
        from lambda_cdm_tpu.core.config import SimulationConfig
        cfg = SimulationConfig()
        cfg.compute.mesh.balance_weight = "entropy"
        with pytest.raises(ValueError, match="balance_weight"):
            cfg.validate()
