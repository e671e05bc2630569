import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lambda_cdm_tpu.ops.fast_treepm import initialize_fast, fast_run
from lambda_cdm_tpu.physics.cosmology import CosmologyParams
n, box, ng = 1_000_000, 100.0, 192
pos = jax.random.uniform(jax.random.PRNGKey(0), (n,3), maxval=box)
vel = jnp.zeros((n,3)); m = jnp.full((n,), 27.75*0.31*box**3/n)
params = CosmologyParams()
def sync(x): np.asarray(jax.device_get(x.ravel()[0:1]))
for pal in (False, True):
    fstate, kw = initialize_fast(pos, vel, m, 0.02, box_size=box, pm_grid=ng, softening=0.01)
    kw["pm_pallas"] = pal
    fs = fast_run(fstate, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
    sync(fs.bpos)
    t0 = time.perf_counter()
    fs = fast_run(fs, params, 1e-6, n_steps=32, rebucket_every=16, **kw)
    sync(fs.bpos)
    print(f"pm_pallas={pal}: {(time.perf_counter()-t0)/32*1e3:.1f} ms/step")
