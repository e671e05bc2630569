"""Generic solvers on a 2D pencil device mesh (degenerate z=1 blocks).

The reference's MPI layer builds whatever Cartesian topology
MPI_Dims_create returns — 1D, 2D or 3D (domain_decomposition.cpp:10-112);
its force pipeline is topology-agnostic. Here the generic mesh path
(ring direct / GSPMD PM / halo TreePM) reuses the 3D block machinery on
a (sx, sy, 1) mesh when compute.mesh.axes gives only shx+shy: the z-axis
ppermutes degenerate to periodic self-sends. The dedicated pencil-rod
stepper (parallel/fast_mesh2d) covers treepm_fast; these tests cover
everything else on that topology.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.parallel.mesh import make_mesh3d, particle_sharding
from lambda_cdm_tpu.parallel.sharded import ring_direct_accelerations
from lambda_cdm_tpu.parallel.sharded_treepm import (
    sharded_treepm_accelerations)

pytestmark = pytest.mark.slow  # heavy tier (smoke cover in test_smoke_fast.py)

AX = ("shx", "shy", "shz")
DIMS = (2, 4, 1)


@pytest.fixture(scope="module")
def mesh2(cpu_devices):
    return make_mesh3d(DIMS)


@pytest.fixture(scope="module")
def cloud(mesh2):
    """Random particles, padded + migrated to their owning (x, y) pencils
    (the halo short-range buckets rows into the LOCAL block, so rows must
    live on their owners — same contract as the engine's mesh path)."""
    from lambda_cdm_tpu.parallel.exchange import (migrate_particles,
                                                  pad_particles)
    key = jax.random.PRNGKey(7)
    n, box = 2048, 100.0
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jax.random.uniform(jax.random.PRNGKey(8), (n,), minval=0.5,
                           maxval=2.0)
    vel = jnp.zeros_like(pos)
    pos, vel, m = pad_particles(pos, vel, m, n_dev=8, factor=1.5)
    ps = particle_sharding(mesh2, AX)
    pos, vel, m = (jax.device_put(pos, ps), jax.device_put(vel, ps),
                   jax.device_put(m, ps))
    n_loc = pos.shape[0] // 8
    pos, vel, m, ovf = migrate_particles(pos, vel, m, box_size=box,
                                         capacity=n_loc, mesh=mesh2,
                                         axis_name=AX)
    assert int(ovf) == 0
    return pos, m, box


def test_ring_direct_on_pencils(mesh2, cloud):
    """Ring direct over the flattened (2,4,1) device order matches the
    single-chip direct solver."""
    from lambda_cdm_tpu.forces.direct import direct_accelerations
    pos, m, box = cloud
    acc = ring_direct_accelerations(pos, m, box_size=box, softening=0.5,
                                    g_const=43.007, mesh=mesh2,
                                    axis_name=AX)
    ref = direct_accelerations(pos, m, box_size=box, softening=0.5,
                               g_const=43.007)
    live = np.asarray(m) > 0
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(acc)[live], np.asarray(ref)[live],
                               atol=1e-4 * scale)


def test_treepm_on_pencils_matches_single_chip(mesh2, cloud):
    """Full sharded TreePM on the z=1 block mesh (halo short-range with
    z self-wrap) matches the stateless single-chip solver."""
    from lambda_cdm_tpu.forces.treepm import treepm_accelerations
    pos, m, box = cloud
    ng = 32
    acc = sharded_treepm_accelerations(
        pos, m, box_size=box, pm_grid=ng, softening=0.5, g_const=43.007,
        mesh=mesh2, axis_name=AX)
    ref = treepm_accelerations(pos, m, box_size=box, pm_grid=ng,
                               softening=0.5, g_const=43.007)
    live = np.asarray(m) > 0
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(acc)[live], np.asarray(ref)[live],
                               atol=5e-3 * scale)


def test_engine_runs_generic_solver_on_2d_axes(cpu_devices):
    """compute.mesh.axes = {shx, shy} (no shz) drives the generic run
    loop: 2D-pencil ownership migration + halo TreePM end to end."""
    import lambda_cdm_tpu as lc
    from lambda_cdm_tpu.core.config import SimulationConfig
    cfg = SimulationConfig()
    cfg.particles.num_particles = 4096   # 16^3 for LPT ICs
    cfg.particles.box_size = 100.0
    cfg.forces.type = "treepm"
    cfg.forces.pm_grid_size = 64
    cfg.forces.softening_length = 0.5
    cfg.compute.mesh.enabled = True
    cfg.compute.mesh.axes = {"shx": 2, "shy": 4}
    cfg.cosmology.initial_redshift = 24.0
    cfg.cosmology.final_redshift = 0.0
    cfg.simulation.time_step = 2e-5
    eng = lc.SimulationEngine(cfg)
    eng.initialize()
    assert eng._mesh is not None
    assert dict(eng._mesh.shape) == {"shx": 2, "shy": 4, "shz": 1}
    eng.run(num_steps=4)
    st = eng.state
    live = np.asarray(st.masses) > 0
    assert live.sum() == 4096
    assert np.all(np.isfinite(np.asarray(st.positions)))
    e = eng.compute_energy()
    assert np.isfinite(float(e["total"]))
