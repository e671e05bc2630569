"""Fast-tier smoke coverage for subsystems whose full suites are marked
slow (> ~30 s each on one core): a breakage in ICs, the fast stepper,
the halo finder, lensing, merger trees, the MXU FFT, or the CLI still
fails the default `-m "not slow"` run within seconds.

The heavy files hold the exhaustive oracles; these are minimal
end-to-end executions with cheap invariant checks.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.physics.cosmology import CosmologyParams

PARAMS = CosmologyParams()


def test_initial_conditions_smoke():
    from lambda_cdm_tpu.physics import initial_conditions as ics
    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(3), PARAMS, ng=16, n_side=8, box_size=50.0,
        a_init=0.02)
    assert pos.shape == (512, 3) and bool(jnp.all(jnp.isfinite(pos)))
    assert bool(jnp.all((pos >= 0) & (pos < 50.0)))
    assert float(jnp.std(vel)) > 0


def test_fast_stepper_smoke():
    from lambda_cdm_tpu.ops.fast_treepm import (fast_plan, fast_run,
                                                flatten_fast_state,
                                                initialize_fast)
    plan = fast_plan(2048, 64.0, 32)
    assert 32 % plan["ncell"] == 0 and "variant" in plan
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (2048, 3), maxval=64.0)
    fs, kw = initialize_fast(pos, jnp.zeros_like(pos),
                             jnp.ones((2048,)), 0.5, box_size=64.0,
                             pm_grid=32, softening=0.5)
    fs = fast_run(fs, PARAMS, 1e-5, n_steps=2, rebucket_every=1, **kw)
    out = flatten_fast_state(fs)
    assert int(fs.overflow) == 0 and int(fs.step) == 2
    assert bool(jnp.all(jnp.isfinite(out[0])))


def test_halo_finder_smoke():
    from lambda_cdm_tpu.analysis import halo_finder as hf
    key = jax.random.PRNGKey(1)
    c1 = 10.0 + 0.1 * jax.random.normal(key, (64, 3))
    c2 = 30.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    bg = jax.random.uniform(jax.random.PRNGKey(3), (128, 3), maxval=50.0)
    pos = jnp.concatenate([c1, c2, bg])
    m = jnp.ones((pos.shape[0],))
    # tiny explicit geometry: a fine fof_plan lattice (cells >= b) on
    # 256 particles compiles a million-cell hook for nothing, and the
    # 64-particle point clumps overflow its uniform-density capacity
    labels, ovf = hf.fof_labels(pos, 50.0, 0.5, ncell=8, capacity=128)
    assert int(ovf) == 0
    cat = hf.catalog_from_labels(pos, jnp.zeros_like(pos), m, labels,
                                 50.0, min_particles=32)
    assert int(cat.num_halos) >= 2


def test_lensing_smoke():
    from lambda_cdm_tpu.raytracing import lensing as lz
    key = jax.random.PRNGKey(4)
    delta = 0.1 * jax.random.normal(key, (2, 32, 32))
    chis = jnp.array([100.0, 200.0])
    a_pl = jnp.array([0.8, 0.9])
    kappa = lz.born_convergence(PARAMS, delta, chis, 50.0, 300.0, a_pl)
    assert kappa.shape == (32, 32)
    assert bool(jnp.all(jnp.isfinite(kappa)))


def test_merger_tree_smoke():
    from lambda_cdm_tpu.analysis.merger_trees import link_progenitors
    n = 100
    # halo 0 keeps its first 40 particles across snapshots
    la = jnp.where(jnp.arange(n) < 40, 0, -1)
    lb = jnp.where(jnp.arange(n) < 40, 0, -1)
    links = link_progenitors(la, lb, num_a=1, num_b=1, min_shared=10)
    assert int(np.asarray(links.main_progenitor)[0]) == 0


def test_matmul_fft_smoke():
    from lambda_cdm_tpu.ops.matmul_fft import rfftn_mm
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 16, 16))
    got = rfftn_mm(x)
    ref = jnp.fft.rfftn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3)


def test_solver_agreement_smoke():
    """direct vs treepm on a tiny box agree to the split tolerance."""
    from lambda_cdm_tpu.forces.direct import direct_accelerations
    from lambda_cdm_tpu.forces.treepm import treepm_accelerations
    key = jax.random.PRNGKey(6)
    pos = jax.random.uniform(key, (512, 3), maxval=32.0)
    m = jnp.ones((512,))
    a_d = direct_accelerations(pos, m, 32.0, softening=0.5, g_const=1.0)
    a_t = treepm_accelerations(pos, m, 32.0, pm_grid=32, softening=0.5,
                               g_const=1.0)
    scale = float(jnp.max(jnp.abs(a_d)))
    assert float(jnp.max(jnp.abs(a_d - a_t))) / scale < 0.05


def test_migration_smoke(cpu_devices):
    from lambda_cdm_tpu.parallel import exchange as ex
    from lambda_cdm_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    pos = jax.random.uniform(jax.random.PRNGKey(7), (1024, 3),
                             maxval=50.0)
    vel = jnp.zeros_like(pos)
    m = jnp.ones((1024,))
    # production headroom: per-device arrivals jitter around n/n_dev
    pos, vel, m = ex.pad_particles(pos, vel, m, n_dev=8, factor=1.5)
    p2, v2, m2, ovf = ex.migrate_particles(
        pos, vel, m, box_size=50.0, capacity=pos.shape[0] // 8,
        mesh=mesh)
    assert int(ovf) == 0 and int(jnp.sum(m2 > 0)) == 1024


def test_observer_smoke():
    import lambda_cdm_tpu as lc
    eng = (lc.SimulationBuilder()
           .with_particles(512).with_box_size(32.0)
           .with_time_step(1e-5)
           .with_force_computer("direct", softening_length=0.5)
           .with_observer(lc.ProgressObserver(every=2))
           .build())
    eng.run(num_steps=2)
    assert eng.statistics.total_steps >= 2


def test_cli_smoke(tmp_path):
    from lambda_cdm_tpu.cli import main as cli_main
    from lambda_cdm_tpu.core.config import SimulationConfig
    p = tmp_path / "c.json"
    p.write_text(json.dumps(SimulationConfig().to_dict()))
    assert cli_main(["validate", str(p)]) == 0
