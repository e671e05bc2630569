"""3D-block sharded fast stepper vs the single-chip fast path.

Runs on the 8-device virtual CPU mesh (conftest) shaped (2, 2, 2):
the full analogue of the reference's 3D MPI Cartesian rank grid
pipeline (domain_decomposition.cpp:10-112, cluster_comm.cpp:90-216).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.ops.fast_treepm import (fast_run, flatten_fast_state,
                                            initialize_fast)
from lambda_cdm_tpu.parallel.fast_mesh3d import (cell_order3d,
                                                 cell_order3d_inv,
                                                 initialize_mesh_fast3d,
                                                 mesh_fast_plan3d,
                                                 mesh_fast_run3d,
                                                 mesh_rebucket3d)
from lambda_cdm_tpu.parallel.mesh import make_mesh3d
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

N, BOX, NG = 6000, 64.0, 48


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.fixture(scope="module")
def mesh222():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh3d((2, 2, 2))


@pytest.fixture(scope="module")
def particles():
    key = jax.random.PRNGKey(3)
    pos = jax.random.uniform(key, (N, 3), maxval=BOX)
    vel = 0.05 * jax.random.normal(jax.random.PRNGKey(4), (N, 3))
    masses = jnp.full((N,), 13.0, jnp.float32)
    return pos, vel, masses


def _sorted_live(pos, vel, mass, ids):
    live = np.asarray(mass) > 0
    order = np.argsort(np.asarray(ids)[live])
    return (np.asarray(pos)[live][order], np.asarray(vel)[live][order],
            np.asarray(mass)[live][order])


class TestPlanAndOrder:
    def test_plan_divisibility(self):
        plan = mesh_fast_plan3d(100_000, 100.0, 96, (2, 2, 2))
        assert plan is not None
        assert plan["ncell"] % 2 == 0
        assert 96 % plan["ncell"] == 0

    def test_plan_rejects_bad_grid(self):
        # ng must divide by dy*dz for the cube->pencil all_to_all
        assert mesh_fast_plan3d(1000, 100.0, 50, (2, 2, 2)) is None

    def test_cell_order_roundtrip(self):
        p = np.asarray(cell_order3d(8, 2, 2, 2))
        q = np.asarray(cell_order3d_inv(8, 2, 2, 2))
        assert np.array_equal(p[q], np.arange(8 ** 3))
        assert sorted(p.tolist()) == list(range(8 ** 3))


class TestAccel3d:
    def test_matches_single_chip(self, mesh222, particles):
        """Sharded 3D accel == single-chip fast accel on live slots.
        Geometry chosen so both planners pick ncell=6 (plans with
        different ncell differ by far-pair stencil truncation)."""
        pos, vel, masses = particles
        mesh3d = mesh222

        fs1, kw1 = initialize_fast(pos, vel, masses, 0.5, box_size=BOX,
                                   pm_grid=NG, softening=0.3)
        fs2, kw2 = initialize_mesh_fast3d(pos, vel, masses, 0.5,
                                          mesh=mesh3d, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        assert kw1["ncell"] == kw2["ncell"], "test geometry drifted"

        a1 = {}
        for i, m, a in zip(np.asarray(fs1.ids).ravel(),
                           np.asarray(fs1.bmass).ravel(),
                           np.asarray(fs1.acc).reshape(-1, 3)):
            if m > 0:
                a1[int(i)] = a
        scale = max(np.linalg.norm(a, np.inf) for a in a1.values())
        worst = 0.0
        for i, m, a in zip(np.asarray(fs2.ids).ravel(),
                           np.asarray(fs2.bmass).ravel(),
                           np.asarray(fs2.acc).reshape(-1, 3)):
            if m > 0:
                worst = max(worst,
                            float(np.max(np.abs(a - a1[int(i)]))))
        assert worst / scale < 1e-4, worst / scale

    def test_run_matches_single_chip(self, mesh222, particles):
        """A 6-step run (with a mid-run rebucket) on the (2, 2, 2) mesh
        tracks the single-chip stepper particle by particle."""
        pos, vel, masses = particles
        mesh3d = mesh222
        params = CosmologyParams()
        dt = 2e-4

        fs1, kw1 = initialize_fast(pos, vel, masses, 0.5, box_size=BOX,
                                   pm_grid=NG, softening=0.3)
        fs2, kw2 = initialize_mesh_fast3d(pos, vel, masses, 0.5,
                                          mesh=mesh3d, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        assert kw1["ncell"] == kw2["ncell"], "test geometry drifted"
        fs1 = fast_run(fs1, params, dt, n_steps=6, rebucket_every=3,
                       **kw1)
        fs2 = mesh_fast_run3d(fs2, params, dt, mesh=mesh3d, n_steps=6,
                              rebucket_every=3, **kw2)
        assert int(fs2.overflow) == 0

        p1, v1, m1 = _sorted_live(*flatten_fast_state(fs1, with_ids=True))
        p2, v2, m2 = _sorted_live(fs2.bpos.reshape(-1, 3),
                                  fs2.bvel.reshape(-1, 3),
                                  fs2.bmass.reshape(-1),
                                  fs2.ids.reshape(-1))
        assert p1.shape == p2.shape
        np.testing.assert_allclose(p2, p1, atol=5e-4)
        np.testing.assert_allclose(v2, v1, atol=5e-3)
        np.testing.assert_allclose(m2, m1)


class TestEngineMeshFast3d:
    """compute.mesh.axes = {shx, shy, shz} drives the 3D-block sharded
    stepper through the engine API."""

    def test_engine_3d_matches_single(self, mesh222, particles):
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state
        pos, vel, m = particles

        def config():
            cfg = SimulationConfig()
            cfg.particles.num_particles = N
            cfg.particles.box_size = BOX
            cfg.particles.initial_conditions.type = "uniform_random"
            cfg.forces.type = "treepm_fast"
            cfg.forces.pm_grid_size = 64     # both planners pick ncell=4
            cfg.forces.softening_length = 0.3
            cfg.forces.rebucket_every = 4
            cfg.time.initial_timestep = 2e-4
            cfg.time.final_time = 1e9
            cfg.cosmology.initial_redshift = 49.0
            cfg.simulation.output_frequency = 4
            cfg.simulation.checkpoint_frequency = 0
            cfg.profiling.output_file = ""
            return cfg

        cfg2 = config()
        cfg2.compute.mesh.enabled = True
        cfg2.compute.mesh.axes = {"shx": 2, "shy": 2, "shz": 2}
        eng2 = SimulationEngine(cfg2)
        eng2.initialize(state=make_state(pos, vel, m, scale_factor=0.5))
        assert getattr(eng2, "_fast_mesh_3d", False), \
            "engine did not select the 3D-block stepper"
        eng2.run(num_steps=8)

        eng_s = SimulationEngine(config())
        eng_s.initialize(state=make_state(pos, vel, m, scale_factor=0.5))
        eng_s.run(num_steps=8)

        p2 = np.asarray(eng2.state.positions)
        p1 = np.asarray(eng_s.state.positions)
        m2 = np.asarray(eng2.state.masses)
        m1 = np.asarray(eng_s.state.masses)
        np.testing.assert_allclose(m2, m1)
        np.testing.assert_allclose(p2[m2 > 0], p1[m1 > 0], atol=5e-4)


class TestOverflowGrowRetry:
    def test_raise_carries_intact_state_and_regrow_is_lossless(
            self, mesh222, particles):
        """Collapsing the field into one cell makes the rebucket lossy:
        on_overflow='raise' must throw BEFORE committing (state intact),
        and a plan_override rebuild at grown capacity keeps every id
        (the engine's _grow_mesh_fast_capacity contract)."""
        from lambda_cdm_tpu.ops.fast_treepm import (BucketOverflowError,
                                                    flatten_fast_state)
        pos, vel, masses = particles
        fs2, kw2 = initialize_mesh_fast3d(pos, vel, masses, 0.5,
                                          mesh=mesh222, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        assert int(fs2.overflow) == 0
        cap = kw2["capacity"]
        # pile the live slots of the first cells into one tight blob --
        # more than one bucket capacity's worth, so the rebucket is
        # lossy at the current capacity
        ncells = fs2.bpos.shape[0]
        n_src = 3 * cap // 128 + 8           # cells donating particles
        move = (jnp.arange(ncells)[:, None] < n_src) & (fs2.bmass > 0)
        blob = 0.5 + 0.02 * jax.random.normal(
            jax.random.PRNGKey(8), fs2.bpos.shape)
        tight = jnp.where(move[..., None], blob, fs2.bpos)
        n_moved = int(jnp.sum(move))
        assert n_moved > cap, "test setup: blob must exceed capacity"
        fs_tight = fs2.replace(bpos=tight)
        params = CosmologyParams()
        with pytest.raises(BucketOverflowError) as exc_info:
            mesh_fast_run3d(fs_tight, params, 1e-5, mesh=mesh222,
                            n_steps=1, rebucket_every=1,
                            steps_since_rebucket=1, on_overflow="raise",
                            **kw2)
        carried = exc_info.value.fstate
        assert exc_info.value.steps_done == 0
        # the carried state is the INTACT pre-rebucket state
        ids_in = np.sort(np.asarray(carried.ids).ravel()[
            np.asarray(carried.bmass).ravel() > 0])
        assert ids_in.shape[0] == N
        # regrow: rebuild at a capacity that holds the whole blob
        new_cap = -(-(n_moved + cap) // 128) * 128
        p, v, m, i = flatten_fast_state(carried, with_ids=True)
        plan = {"ncell": kw2["ncell"], "capacity": new_cap,
                "margin": kw2["margin"], "rs": kw2["rs"]}
        st, kw3 = initialize_mesh_fast3d(
            p, v, m, carried.scale_factor, mesh=mesh222, box_size=BOX,
            pm_grid=NG, softening=0.3, plan_override=plan, ids=i)
        assert int(st.overflow) == 0
        ids_out = np.sort(np.asarray(st.ids).ravel()[
            np.asarray(st.bmass).ravel() > 0])
        assert np.array_equal(ids_in, ids_out)
        assert kw3["capacity"] == new_cap


class TestRebucket3d:
    def test_migration_preserves_particles(self, mesh222, particles):
        """Scramble positions within a one-block drift and rebucket:
        all particles survive with ids intact (incl. corner movers that
        hop in x, y AND z)."""
        pos, vel, masses = particles
        mesh3d = mesh222
        fs2, kw2 = initialize_mesh_fast3d(pos, vel, masses, 0.5,
                                          mesh=mesh3d, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        nc = kw2["ncell"]
        cell = BOX / nc
        drift = 0.9 * cell * jnp.ones((3,))
        newpos = jnp.where((fs2.bmass > 0)[..., None],
                           (fs2.bpos + drift) % BOX, 0.0)
        nbp, nbv, nbm, nbi, nba, bad = mesh_rebucket3d(
            newpos, fs2.bvel, fs2.bmass, fs2.ids, fs2.acc, mesh=mesh3d,
            box_size=BOX, ncell=nc, capacity=kw2["capacity"],
            mig_capacity=4096)
        assert int(bad) == 0
        ids_in = np.sort(np.asarray(fs2.ids).ravel()[
            np.asarray(fs2.bmass).ravel() > 0])
        ids_out = np.sort(np.asarray(nbi).ravel()[
            np.asarray(nbm).ravel() > 0])
        assert np.array_equal(ids_in, ids_out)
        # every particle landed in its own cell bucket
        perm = np.asarray(cell_order3d(nc, 2, 2, 2))
        pos_out = np.asarray(nbp)
        mass_out = np.asarray(nbm)
        cidx = np.floor(pos_out / cell).astype(np.int64)
        cidx = np.clip(cidx, 0, nc - 1)
        want = (cidx[..., 0] * nc + cidx[..., 1]) * nc + cidx[..., 2]
        got = perm[np.arange(nc ** 3)][:, None]  # x-major id per row
        ok = (mass_out == 0) | (want == got)
        assert ok.all()
