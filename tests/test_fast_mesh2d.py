"""2D-pencil sharded fast stepper vs the single-chip fast path.

Runs on the 8-device virtual CPU mesh (conftest) shaped (2, 4):
mirrors the reference's 3D Cartesian rank grid pipeline
(domain_decomposition.cpp:10-112, cluster_comm.cpp:90-216) as z-pencils
over a 2D ICI torus.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.ops.fast_treepm import (fast_run, flatten_fast_state,
                                            initialize_fast)
from lambda_cdm_tpu.parallel.fast_mesh2d import (cell_order2d,
                                                 cell_order2d_inv,
                                                 initialize_mesh_fast2d,
                                                 mesh_fast_plan2d,
                                                 mesh_fast_run2d,
                                                 mesh_rebucket2d)
from lambda_cdm_tpu.parallel.mesh import make_mesh2d
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

N, BOX, NG = 6000, 64.0, 48


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.fixture(scope="module")
def mesh22():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    return make_mesh2d((2, 2))


@pytest.fixture(scope="module")
def mesh24():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh2d((2, 4))


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
        plan = mesh_fast_plan2d(100_000, 100.0, 96, (2, 4))
        assert plan is not None
        assert plan["ncell"] % 2 == 0 and plan["ncell"] % 4 == 0
        assert 96 % plan["ncell"] == 0

    def test_cell_order_roundtrip(self):
        p = np.asarray(cell_order2d(8, 2, 4))
        q = np.asarray(cell_order2d_inv(8, 2, 4))
        assert np.array_equal(p[q], np.arange(8 ** 3))
        assert sorted(p.tolist()) == list(range(8 ** 3))


class TestAccel2d:
    def test_matches_single_chip(self, mesh22, particles):
        """Sharded 2D accel == single-chip fast accel on live slots.
        Geometry chosen so both planners pick ncell=6 (plans with
        different ncell differ by far-pair stencil truncation)."""
        pos, vel, masses = particles
        mesh2d = mesh22

        fs1, kw1 = initialize_fast(pos, vel, masses, 0.5, box_size=BOX,
                                   pm_grid=NG, softening=0.3)
        fs2, kw2 = initialize_mesh_fast2d(pos, vel, masses, 0.5,
                                          mesh=mesh2d, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        assert kw1["ncell"] == kw2["ncell"], "test geometry drifted"

        # compare per-particle accelerations by id
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

    def test_run_matches_single_chip(self, mesh24, particles):
        """A 6-step run (with a mid-run rebucket) on the full (2, 4)
        mesh (ncell=4 under pm_grid 64: both planners agree; nyl=1
        exercises the degenerate one-plane-per-device y axis) tracks
        the single-chip stepper particle by particle."""
        pos, vel, masses = particles
        mesh2d = mesh24
        ng = 64
        params = CosmologyParams()
        dt = 2e-4

        fs1, kw1 = initialize_fast(pos, vel, masses, 0.5, box_size=BOX,
                                   pm_grid=ng, softening=0.3)
        fs2, kw2 = initialize_mesh_fast2d(pos, vel, masses, 0.5,
                                          mesh=mesh2d, box_size=BOX,
                                          pm_grid=ng, softening=0.3)
        assert kw1["ncell"] == kw2["ncell"], "test geometry drifted"
        fs1 = fast_run(fs1, params, dt, n_steps=6, rebucket_every=3,
                       **kw1)
        fs2 = mesh_fast_run2d(fs2, params, dt, mesh=mesh2d, n_steps=6,
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


class TestEngineMeshFast2d:
    """compute.mesh.axes = {shx, shy} drives the 2D-pencil sharded
    stepper through the engine API."""

    def test_engine_2d_matches_single(self, mesh24, particles):
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
        cfg2.compute.mesh.axes = {"shx": 2, "shy": 4}
        eng2 = SimulationEngine(cfg2)
        eng2.initialize(state=make_state(pos, vel, m, scale_factor=0.5))
        assert getattr(eng2, "_fast_mesh_2d", False), \
            "engine did not select the 2D-pencil stepper"
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


class TestRebucket2d:
    def test_migration_preserves_particles(self, mesh24, particles):
        """Scramble positions within a one-block drift and rebucket:
        all particles survive with ids intact (incl. diagonal movers)."""
        pos, vel, masses = particles
        mesh2d = mesh24
        fs2, kw2 = initialize_mesh_fast2d(pos, vel, masses, 0.5,
                                          mesh=mesh2d, box_size=BOX,
                                          pm_grid=NG, softening=0.3)
        nc = kw2["ncell"]
        cell = BOX / nc
        # drift every particle by most of one cell diagonally (crosses
        # block boundaries in x AND y for border cells; with nyl=1 the
        # majority of each block migrates, so size migration explicitly)
        drift = 0.9 * cell * jnp.ones((3,))
        newpos = jnp.where((fs2.bmass > 0)[..., None],
                           (fs2.bpos + drift) % BOX, 0.0)
        nbp, nbv, nbm, nbi, nba, bad = mesh_rebucket2d(
            newpos, fs2.bvel, fs2.bmass, fs2.ids, fs2.acc, mesh=mesh2d,
            box_size=BOX, ncell=nc, capacity=kw2["capacity"],
            mig_capacity=2048)
        assert int(bad) == 0
        ids_in = np.sort(np.asarray(fs2.ids).ravel()[
            np.asarray(fs2.bmass).ravel() > 0])
        ids_out = np.sort(np.asarray(nbi).ravel()[
            np.asarray(nbm).ravel() > 0])
        assert np.array_equal(ids_in, ids_out)
        # every particle landed in its own cell bucket
        perm_inv = np.asarray(cell_order2d(nc, 2, 4))  # (2,4) mesh
        pos_out = np.asarray(nbp)
        mass_out = np.asarray(nbm)
        cidx = np.floor(pos_out / cell).astype(np.int64)
        cidx = np.clip(cidx, 0, nc - 1)
        want = (cidx[..., 0] * nc + cidx[..., 1]) * nc + cidx[..., 2]
        got = perm_inv[np.arange(nc ** 3)][:, None]  # x-major id per row
        ok = (mass_out == 0) | (want == got)
        assert ok.all()
