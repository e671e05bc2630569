import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.ops.fast_treepm import (initialize_fast, _fast_segment,
                                            _rebucket_jit)
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

def sync(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

key = jax.random.PRNGKey(0)
n, box, ng = 1_000_000, 100.0, 192
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 8.6)
params = CosmologyParams()
fstate, kw = initialize_fast(pos, jnp.zeros((n, 3)), m, 0.02, box_size=box,
                             pm_grid=ng, softening=0.01)
sync(fstate.acc)
print("init done", flush=True)

def bench(f, label, reps=3):
    t0 = time.perf_counter(); out = f(); sync(out)
    print(f"{label}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    t = time.perf_counter()
    for _ in range(reps): out = f(); sync(out)
    print(f"{label}: {(time.perf_counter()-t)/reps*1e3:.1f} ms", flush=True)

bench(lambda: _fast_segment(fstate, params, 1e-6, n_steps=16, **kw),
      "segment16 (per-16)", reps=2)
bench(lambda: _rebucket_jit(fstate, box_size=kw["box_size"],
                            ncell=kw["ncell"], capacity=kw["capacity"]),
      "rebucket", reps=3)
EOF_MARKER = None
