import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.forces.treepm import bucket_particles, short_range_bucketed
from lambda_cdm_tpu.ops.bucketed_pm import (deposit_from_buckets,
                                            gather_to_buckets,
                                            pm_accelerations_bucketed)

def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

def bench(f, label, reps=3):
    t0 = time.perf_counter()
    out = f(); sync(out)
    print(f"{label}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    t = time.perf_counter()
    for _ in range(reps): out = f(); sync(out)
    print(f"{label}: {(time.perf_counter()-t)/reps*1e3:.1f} ms", flush=True)

key = jax.random.PRNGKey(0)
n, box, ng = 1_000_000, 100.0, 256
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 8.6)
ncell, cap, margin, rs = 32, 80, 1, 0.48828125
bpos, bmass, pslot, ovf = bucket_particles(pos, m, box, ncell=ncell, capacity=cap)
sync(bpos)
print("bucketed", flush=True)

bench(lambda: deposit_from_buckets(bpos, bmass, ncell=ncell, ng=ng,
                                   box_size=box, margin=margin)[0],
      "deposit_from_buckets")
grid = jax.random.normal(jax.random.PRNGKey(1), (ng, ng, ng))
bench(lambda: gather_to_buckets(grid, bpos, bmass, ncell=ncell, ng=ng,
                                box_size=box, margin=margin),
      "gather_to_buckets")
bench(lambda: pm_accelerations_bucketed(bpos, bmass, ncell=ncell, ng=ng,
                                        box_size=box, split_scale=rs,
                                        margin=margin, gradient="fd4")[0],
      "pm_bucketed fd4")
bench(lambda: short_range_bucketed(bpos.reshape(ncell**3, cap, 3),
                                   bmass.reshape(ncell**3, cap),
                                   box, rs, 0.01, ncell=ncell, capacity=cap,
                                   use_poly=True),
      "short_range poly", reps=2)
