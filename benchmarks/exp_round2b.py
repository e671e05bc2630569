"""TPU experiment: round-2b short-range variants + rod-resident PM path."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
print("devices:", jax.devices())

from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bpm
from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range

n, box, ng = 1_000_000, 100.0, 192
nc, cap, margin = 24, 128, 1
rs = 1.25 * box / ng
pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, _, ovf = jax.jit(
    bucket_particles, static_argnames=("ncell", "capacity"))(
        pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1])
occ = int(np.max(np.asarray((bmass > 0).sum(axis=1))))
print("bucketed, overflow:", int(ovf), "max occupancy:", occ)


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))


def timeit(f, *a, reps=5, name=""):
    t0 = time.perf_counter()
    out = f(*a)
    sync(out)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


# --- short-range variants ---
results = {}
for variant in ("vpu", "vpu2", "vpu", "vpu2"):
    f = jax.jit(lambda bp, bm, v=variant: pallas_short_range(
        bp, bm, ncell=nc, capacity=cap, box_size=box, rs=float(rs),
        softening=0.05, variant=v))
    out = timeit(f, bpos, bmass, name=f"short {variant}")
    results[variant] = np.asarray(out)

live = np.asarray(bmass) > 0
base = results["vpu"]
scale = np.abs(base).max()
d = np.abs(results["vpu2"] - base)[live].max()
print(f"vpu2 vs vpu: max|diff| {d:.3e} rel {d/scale:.2e}")

# direct kernel variants at 100k
from lambda_cdm_tpu.ops.pallas_direct import pallas_direct_accelerations
pos100k = jax.random.uniform(jax.random.PRNGKey(1), (100_000, 3), maxval=box)
m100k = jnp.ones((100_000,))
for dv in ("v1", "v2", "v1", "v2"):
    f = jax.jit(lambda p, v=dv: pallas_direct_accelerations(
        p, m100k, box, 0.05, variant=v))
    timeit(f, pos100k, name=f"direct100k {dv}")

# --- PM: old pipeline vs rod-resident ---
from lambda_cdm_tpu.ops.pallas_pm_rods import (assemble_rods,
                                               pallas_deposit_rods,
                                               pallas_gather_fd4)

blocks = timeit(
    jax.jit(lambda bp, bm: pallas_deposit_rods(
        bp, bm, ncell=nc, ng=ng, box_size=box, margin=margin)[0]),
    bpos, bmass, name="rod deposit blocks")
grid = timeit(
    jax.jit(lambda b: assemble_rods(b, ncell=nc, ng=ng, margin=margin)),
    blocks, name="rod assemble")
phi = jax.random.normal(jax.random.PRNGKey(2), (ng, ng, ng))
acc = timeit(
    jax.jit(lambda p, bp: pallas_gather_fd4(
        p, bp, ncell=nc, ng=ng, box_size=box, margin=margin)),
    phi, bpos, name="rod gather fd4")

# full PM long-range: new default (pallas) vs old pallas-blocks path
f_new = jax.jit(lambda bp, bm: bpm.pm_accelerations_bucketed(
    bp, bm, ncell=nc, ng=ng, box_size=box, split_scale=float(rs),
    margin=margin, gradient="fd4", use_pallas=True)[0])
acc_new = timeit(f_new, bpos, bmass, name="PM full (rod path)")

# correctness vs the jnp reference path
f_ref = jax.jit(lambda bp, bm: bpm.pm_accelerations_bucketed(
    bp, bm, ncell=nc, ng=ng, box_size=box, split_scale=float(rs),
    margin=margin, gradient="fd4", use_pallas=False)[0])
acc_ref = timeit(f_ref, bpos, bmass, name="PM full (jnp ref path)")
d = np.abs(np.asarray(acc_new) - np.asarray(acc_ref))[live].max()
s = np.abs(np.asarray(acc_ref)).max()
print(f"PM rod-vs-jnp: max|diff| {d:.3e} rel {d/s:.2e}")
