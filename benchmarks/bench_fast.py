import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.ops.fast_treepm import initialize_fast, fast_run
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

def sync(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

ng = int(sys.argv[1]) if len(sys.argv) > 1 else 192
n, box = 1_000_000, 100.0
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (n, 3), maxval=box)
vel = jnp.zeros((n, 3))
m = jnp.full((n,), 8.6)
params = CosmologyParams()

t0 = time.perf_counter()
fstate, kw = initialize_fast(pos, vel, m, 0.02, box_size=box, pm_grid=ng,
                             softening=0.01)
sync(fstate.acc)
print(f"init {time.perf_counter()-t0:.0f}s; plan:",
      {k: kw[k] for k in ("ncell", "capacity", "rs")}, flush=True)

t0 = time.perf_counter()
fs = fast_run(fstate, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
sync(fs.bpos)
print(f"compile+16: {time.perf_counter()-t0:.0f}s", flush=True)

t0 = time.perf_counter()
fs = fast_run(fs, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
sync(fs.bpos)
dt = (time.perf_counter()-t0)/32
print(f"ng={ng}: {dt*1e3:.1f} ms/step -> {n/dt:.3e} particle-steps/s")
print("overflow:", int(fs.overflow), "dropped:", int(fs.dropped))
