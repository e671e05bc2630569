"""Step composition at the round-3 headline geometry (1M, 192^3 PM,
ncell=32, cap=64, vpu4b + replica-window PM rods): the numbers behind
BASELINE.md's composition-floor paragraph."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops.bucketed_pm import pm_accelerations_bucketed
from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range
from lambda_cdm_tpu.ops import fast_treepm as ft
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

n, box, ng = 1_000_000, 100.0, 192
plan = ft.fast_plan(n, box, ng)
nc, cap, var = plan["ncell"], plan["capacity"], plan["variant"]
rs = plan["rs"]
print("plan:", plan)
pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
m = jnp.full((n,), 27.75 * 0.31 * box ** 3 / n)

def sync(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))
def timeit(f, *a, reps=10, name=""):
    out = f(*a); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")

bpos, bmass, _, ovf = jax.jit(bucket_particles, static_argnames=("ncell", "capacity"))(
    pos, m, box, ncell=nc, capacity=cap)
sync(bpos); print("overflow:", int(ovf))
b3 = bpos.reshape(nc**3, cap, 3); bm = bmass.reshape(nc**3, cap)

sr = jax.jit(lambda p, q: pallas_short_range(
    p, q, ncell=nc, capacity=cap, box_size=box, rs=float(rs),
    softening=0.01, variant=var))
timeit(sr, b3, bm, name=f"short-range {var} (nc={nc}, cap={cap})")

pm = jax.jit(lambda p, q: pm_accelerations_bucketed(
    p, q, ncell=nc, ng=ng,
    box_size=box, split_scale=float(rs), margin=plan["margin"],
    gradient="fd4", use_pallas=True))
timeit(pm, b3, bm, name=f"pm bucketed fd4 (ng={ng}, ppc={ng//nc})")

# full fused segment (16 steps no rebucket) on the production stepper
fstate, kw = ft.initialize_fast(pos, jnp.zeros((n,3)), m, 0.02,
                                box_size=box, pm_grid=ng, softening=0.01)
sync(fstate.acc)
params = CosmologyParams()
fs = ft.fast_run(fstate, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
sync(fs.bpos)
t0 = time.perf_counter()
fs = ft.fast_run(fs, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
sync(fs.bpos)
print(f"full step: {(time.perf_counter()-t0)/32*1e3:.2f} ms")
