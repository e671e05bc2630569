"""TPU experiment: Pallas deposit/gather vs jnp bucketed_pm at 1M/192^3."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("devices:", jax.devices())

from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bpm
from lambda_cdm_tpu.ops.pallas_pm import pallas_deposit_blocks, pallas_gather_fields

n, box, ng, nc, cap, margin = 1_000_000, 100.0, 192, 24, 128, 1
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, _, ovf = jax.jit(bucket_particles, static_argnames=("ncell","capacity"))(pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1]); print("overflow:", int(ovf))

def sync(x): np.asarray(jax.device_get(x.ravel()[0:1]))
def timeit(f, *a, reps=5, name=""):
    out = f(*a); jax.tree.map(lambda t: sync(t), out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    jax.tree.map(lambda t: sync(t), out)
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f"{name}: {dt:.1f} ms")
    return out, dt

# deposit: jnp vs pallas (+assembly both)
f_jnp = jax.jit(lambda bp, bm: bpm.deposit_from_buckets(bp, bm, ncell=nc, ng=ng, box_size=box, margin=margin))
(g_ref, dr), t_jnp = timeit(f_jnp, bpos, bmass, name="deposit jnp (incl assemble)")

def dep_pallas(bp, bm):
    blocks, drop = pallas_deposit_blocks(bp, bm, ncell=nc, ng=ng, box_size=box, margin=margin)
    return bpm._assemble(blocks, ncell=nc, ng=ng, margin=margin), drop
f_pal = jax.jit(dep_pallas)
(g_pal, dp), t_pal = timeit(f_pal, bpos, bmass, name="deposit pallas (incl assemble)")
print("deposit err:", float(jnp.abs(g_pal-g_ref).max()), "scale:", float(jnp.abs(g_ref).max()))

# gather 3 fields: jnp vs pallas (incl extract both)
fields = jax.random.normal(jax.random.PRNGKey(2), (3, ng, ng, ng))
f_gj = jax.jit(lambda f, bp, bm: bpm.gather_to_buckets(f, bp, bm, ncell=nc, ng=ng, box_size=box, margin=margin))
v_ref, t_gj = timeit(f_gj, fields, bpos, bmass, name="gather jnp (incl extract)")

def gat_pallas(f, bp):
    fb = jnp.stack([bpm._extract(f[i], ncell=nc, ng=ng, margin=margin) for i in range(3)], axis=1)
    return pallas_gather_fields(fb, bp, ncell=nc, ng=ng, box_size=box, margin=margin)
f_gp = jax.jit(gat_pallas)
v_pal, t_gp = timeit(f_gp, fields, bpos, name="gather pallas (incl extract)")
live = np.asarray(bmass)[...,None] > 0
err = np.abs(np.where(live, np.asarray(v_pal), 0) - np.where(live, np.asarray(v_ref), 0))
print("gather err:", err.max(), "scale:", np.abs(np.asarray(v_ref)).max())
