import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops.bucketed_pm import pm_accelerations_bucketed

n, box, ng, nc, cap, margin = 1_000_000, 100.0, 192, 24, 128, 1
rs = 1.25*box/ng
pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, _, ovf = jax.jit(bucket_particles, static_argnames=("ncell","capacity"))(pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1])

def sync(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))
def timeit(f, *a, reps=5, name=""):
    out = f(*a); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")

for up in (False, True):
    f = jax.jit(lambda bp, bm, u=up: pm_accelerations_bucketed(
        bp, bm, ncell=nc, ng=ng, box_size=box, split_scale=rs, margin=margin,
        gradient="fd4", use_pallas=u))
    timeit(f, bpos, bmass, name=f"pm_accel_bucketed fd4 use_pallas={up}")
