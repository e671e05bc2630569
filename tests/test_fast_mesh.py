"""Multi-chip persistent fast stepper (parallel/fast_mesh) vs the
single-device solvers, on the 8-device virtual CPU mesh.

Validates the reference's full MPI pipeline semantics (migrate -> ghost
exchange -> local force -> global solve, cluster_comm.cpp:90-216) in the
sharded persistent-bucket architecture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops.fast_treepm import (fast_run, initialize_fast)
from lambda_cdm_tpu.parallel.fast_mesh import (initialize_mesh_fast,
                                               mesh_fast_accel,
                                               mesh_fast_plan,
                                               mesh_fast_run,
                                               mesh_rebucket)
from lambda_cdm_tpu.parallel.mesh import make_mesh
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

N, BOX, NG = 4096, 50.0, 48
SOFT = 0.05


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


@pytest.fixture(scope="module")
def particles():
    key = jax.random.PRNGKey(7)
    pos = jax.random.uniform(key, (N, 3), maxval=BOX)
    vel = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    m = jnp.full((N,), 2.0)
    return pos, vel, m


class TestPlan:
    def test_plan_divisibility(self, mesh):
        n_dev = mesh.shape["shard"]
        plan = mesh_fast_plan(N, BOX, NG, n_dev)
        assert plan is not None
        assert plan["ncell"] % n_dev == 0
        assert NG % plan["ncell"] == 0
        assert BOX / plan["ncell"] >= plan["r_cut"]

    def test_plan_none_when_too_small(self):
        assert mesh_fast_plan(N, 1.0, 8, 64) is None


class TestShardedForces:
    def test_accel_matches_single_device(self, mesh, particles):
        """Sharded halo short-range + distributed-FFT PM == the
        single-device fast path's forces on identical buckets."""
        pos, vel, m = particles
        n_dev = mesh.shape["shard"]
        plan = mesh_fast_plan(N, BOX, NG, n_dev)
        nc, cap = plan["ncell"], plan["capacity"]
        bpos, bmass, _, ovf = bucket_particles(pos, m, BOX, ncell=nc,
                                               capacity=cap)
        assert int(ovf) == 0

        acc_mesh, dropped = mesh_fast_accel(
            bpos, bmass, mesh=mesh, box_size=BOX, ng=NG, ncell=nc,
            capacity=cap, margin=plan["margin"], rs=plan["rs"],
            softening=SOFT, g_const=43.0071057317063)
        assert int(dropped) == 0

        # single-device oracle: same bucketed layout, same split
        from lambda_cdm_tpu.ops.fast_treepm import FastState, _accel
        fs = FastState(bpos=bpos, bvel=jnp.zeros_like(bpos),
                       bmass=bmass, ids=jnp.zeros_like(bmass, jnp.int32),
                       acc=jnp.zeros_like(bpos),
                       scale_factor=jnp.float32(1.0),
                       time=jnp.float32(0), step=jnp.int32(0),
                       overflow=jnp.int32(0), dropped=jnp.int32(0))
        acc_ref, _ = _accel(fs, box_size=BOX, ng=NG, ncell=nc,
                            capacity=cap, margin=plan["margin"],
                            rs=plan["rs"], softening=SOFT,
                            g_const=43.0071057317063, gradient="fd4")

        live = np.asarray(bmass) > 0
        a1 = np.asarray(acc_mesh)[live]
        a0 = np.asarray(acc_ref)[live]
        scale = np.abs(a0).max()
        assert np.abs(a1 - a0).max() < 2e-4 * scale

    def test_step_run_matches_single_device(self, mesh, particles):
        """A multi-segment sharded run (with rebucket + migration)
        tracks the single-device fast stepper trajectory."""
        pos, vel, m = particles
        n_dev = mesh.shape["shard"]
        params = CosmologyParams()
        dt = 2e-4

        fs1, kw1 = initialize_fast(
            pos, vel, m, 0.5, box_size=BOX, pm_grid=NG, softening=SOFT)
        fs1 = fast_run(fs1, params, dt, n_steps=8, rebucket_every=4,
                       **kw1)

        fsm, kwm = initialize_mesh_fast(
            pos, vel, m, 0.5, mesh=mesh, box_size=BOX, pm_grid=NG,
            softening=SOFT)
        fsm = mesh_fast_run(fsm, params, dt, mesh=mesh, n_steps=8,
                            rebucket_every=4, **kwm)

        assert int(fsm.overflow) == 0
        assert int(fsm.dropped) == 0

        # compare by persistent particle id (bucket order differs)
        def by_id(fstate):
            ids = np.asarray(fstate.ids).reshape(-1)
            posf = np.asarray(fstate.bpos).reshape(-1, 3)
            keep = ids >= 0
            out = np.zeros((N, 3))
            out[ids[keep]] = posf[keep]
            return out, int(keep.sum())

        p1, n1 = by_id(fs1)
        pm_, nm = by_id(fsm)
        assert n1 == nm == N
        d = np.abs(p1 - pm_)
        d = np.minimum(d, BOX - d)          # periodic
        assert d.max() < 1e-3

    def test_scale_factor_advances(self, mesh, particles):
        pos, vel, m = particles
        params = CosmologyParams()
        fsm, kwm = initialize_mesh_fast(
            pos, vel, m, 0.5, mesh=mesh, box_size=BOX, pm_grid=NG,
            softening=SOFT)
        fsm2 = mesh_fast_run(fsm, params, 1e-4, mesh=mesh, n_steps=3,
                             rebucket_every=8, **kwm)
        assert float(fsm2.scale_factor) > 0.5
        assert int(fsm2.step) == 3


class TestMigration:
    def test_rebucket_migrates_across_slabs(self, mesh, particles):
        """Particles pushed across their slab boundary land in the
        neighbor slab's buckets with identity and velocity intact."""
        pos, vel, m = particles
        n_dev = mesh.shape["shard"]
        plan = mesh_fast_plan(N, BOX, NG, n_dev)
        nc, cap = plan["ncell"], plan["capacity"]
        cell = BOX / nc

        bpos, bmass, pslot, _ = bucket_particles(pos, m, BOX, ncell=nc,
                                                 capacity=cap)
        nslots = nc ** 3 * cap
        safe = jnp.where(pslot >= 0, pslot, nslots)
        bvel = jnp.zeros_like(bpos).reshape(-1, 3).at[safe].set(
            vel, mode="drop").reshape(bpos.shape)
        bids = jnp.full((nslots,), -1, jnp.int32).at[safe].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop").reshape(bmass.shape)

        # drift everything +0.6 cells in x: slab-boundary cells emigrate
        bpos2 = jnp.where((bmass > 0)[..., None],
                          (bpos + jnp.array([0.6 * cell, 0., 0.])) % BOX,
                          0.0)
        nbp, nbv, nbm, nbi, _, ovf, migrated = mesh_rebucket(
            bpos2, bvel, bmass, bids, jnp.zeros_like(bpos2), mesh=mesh,
            box_size=BOX, ncell=nc, capacity=cap)
        assert int(ovf) == 0
        assert int(migrated) > 0
        # all identities survive exactly once
        ids = np.asarray(nbi).reshape(-1)
        ids = np.sort(ids[ids >= 0])
        assert ids.shape[0] == N
        assert (ids == np.arange(N)).all()
        # every particle sits in the bucket of its cell
        live = np.asarray(nbm).reshape(-1) > 0
        posf = np.asarray(nbp).reshape(-1, 3)[live]
        cid = np.arange(nc ** 3).repeat(cap)[live]
        cx = np.clip((posf[:, 0] / BOX * nc).astype(int), 0, nc - 1)
        cy = np.clip((posf[:, 1] / BOX * nc).astype(int), 0, nc - 1)
        cz = np.clip((posf[:, 2] / BOX * nc).astype(int), 0, nc - 1)
        np.testing.assert_array_equal(cid, (cx * nc + cy) * nc + cz)


class TestEngineMeshFast:
    """compute.mesh.enabled + forces.type=treepm_fast drives the
    persistent SHARDED stepper through the engine API."""

    def _config(self):
        from lambda_cdm_tpu.core.config import SimulationConfig
        cfg = SimulationConfig()
        cfg.particles.num_particles = N
        cfg.particles.box_size = BOX
        cfg.particles.initial_conditions.type = "uniform_random"
        cfg.forces.type = "treepm_fast"
        cfg.forces.pm_grid_size = NG
        cfg.forces.softening_length = SOFT
        cfg.forces.rebucket_every = 4
        cfg.time.initial_timestep = 2e-4
        cfg.time.final_time = 1e9
        cfg.cosmology.initial_redshift = 49.0
        cfg.simulation.output_frequency = 4
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""
        return cfg

    def test_engine_mesh_fast_matches_single(self, particles):
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state
        pos, vel, m = particles

        cfg_m = self._config()
        cfg_m.compute.mesh.enabled = True
        eng_m = SimulationEngine(cfg_m)
        eng_m.initialize(state=make_state(pos, vel, m, scale_factor=0.5))
        assert getattr(eng_m, "_fast_mesh_kw", None) is not None, \
            "engine did not select the sharded fast stepper"
        eng_m.run(num_steps=8)

        eng_s = SimulationEngine(self._config())
        eng_s.initialize(state=make_state(pos, vel, m, scale_factor=0.5))
        eng_s.run(num_steps=8)

        # the persistent id channel restores original particle order in
        # BOTH paths: rows are directly comparable
        pm_ = np.asarray(eng_m.state.positions)
        ps = np.asarray(eng_s.state.positions)
        assert int(np.sum(np.asarray(eng_m.state.masses) > 0)) == N
        d = np.abs(pm_ - ps)
        d = np.minimum(d, BOX - d)
        assert d.max() < 1e-3
        assert int(eng_m.state.step) == int(eng_s.state.step)
