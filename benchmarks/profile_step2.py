import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.ops.fast_treepm import initialize_fast, fast_run, _accel
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

@jax.jit
def accel_only_scan(fs):
    def body(carry, _):
        acc, _ = _accel(fs.replace(bpos=carry), **kw)
        return carry + 0.0 * acc, None
    out, _ = jax.lax.scan(body, fs.bpos, None, length=8)
    return out

t0 = time.perf_counter(); out = accel_only_scan(fstate); sync(out)
print(f"accel-only scan compile: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter(); out = accel_only_scan(fstate); sync(out)
print(f"accel-only: {(time.perf_counter()-t0)/8*1e3:.1f} ms/step", flush=True)

t0 = time.perf_counter()
fs = fast_run(fstate, params, 1e-6, n_steps=8, rebucket_every=1000, **kw)
sync(fs.bpos)
print(f"full step (no rebucket) compile: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
fs = fast_run(fs, params, 1e-6, n_steps=8, rebucket_every=1000, **kw)
sync(fs.bpos)
print(f"full step (no rebucket): {(time.perf_counter()-t0)/8*1e3:.1f} ms/step")
