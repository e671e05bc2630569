import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bp
from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range
from lambda_cdm_tpu.ops.fast_treepm import (initialize_fast, fast_run,
                                            _rebucket, FastState)
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

def sync(x): np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

def bench(f, label, reps=3):
    t0 = time.perf_counter(); out = f(); sync(out)
    print(f"{label}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    t = time.perf_counter()
    for _ in range(reps): out = f(); sync(out)
    print(f"{label}: {(time.perf_counter()-t)/reps*1e3:.1f} ms", flush=True)

key = jax.random.PRNGKey(0)
n, box, ng = 1_000_000, 100.0, 192
ncell, cap, margin = 24, 128, 1
rs = 0.6510416666666666
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 8.6)
bpos3, bmass2, _, _ = bucket_particles(pos, m, box, ncell=ncell, capacity=cap)
sync(bpos3)
bpos = bpos3.reshape(ncell**3, cap, 3)
bmass = bmass2.reshape(ncell**3, cap)

bench(lambda: bp.deposit_from_buckets(bpos, bmass, ncell=ncell, ng=ng,
                                      box_size=box, margin=margin)[0],
      "deposit")
grids = jax.random.normal(jax.random.PRNGKey(1), (3, ng, ng, ng))
bench(lambda: bp.gather_to_buckets(grids, bpos, bmass, ncell=ncell, ng=ng,
                                   box_size=box, margin=margin),
      "gather x3")
bench(lambda: bp.pm_accelerations_bucketed(bpos, bmass, ncell=ncell, ng=ng,
                                           box_size=box, split_scale=rs,
                                           margin=margin, gradient="fd4")[0],
      "pm fd4 total")
bench(lambda: pallas_short_range(bpos, bmass, ncell=ncell, capacity=cap,
                                 box_size=box, rs=rs, softening=0.01),
      "pallas short")
g = jax.jit(jnp.fft.rfftn)
grid0 = grids[0]
bench(lambda: jnp.fft.rfftn(grid0), "rfftn 192^3")
# rebucket cost
fstate, kw = initialize_fast(pos, jnp.zeros((n,3)), m, 0.02, box_size=box,
                             pm_grid=ng, softening=0.01)
sync(fstate.acc)
reb = jax.jit(lambda fs: _rebucket(fs, box_size=box, ncell=ncell,
                                   capacity=cap))
bench(lambda: reb(fstate), "rebucket (flat sort 2.8M)")
