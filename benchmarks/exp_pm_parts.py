import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bpm
from lambda_cdm_tpu.ops.pallas_pm import pallas_deposit_blocks, pallas_gather_fields

n, box, ng, nc, cap, margin = 1_000_000, 100.0, 192, 24, 128, 1
pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, _, ovf = jax.jit(bucket_particles, static_argnames=("ncell","capacity"))(pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1])
cc = nc**3
ppc, ell = bpm.block_geometry(ng, nc, margin)

def sync(x): np.asarray(jax.device_get(x.ravel()[0:1]))
def timeit(f, *a, reps=5, name=""):
    out = f(*a); jax.tree.map(sync, out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    jax.tree.map(sync, out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")
    return out

blocks = timeit(jax.jit(lambda bp, bm: pallas_deposit_blocks(bp, bm, ncell=nc, ng=ng, box_size=box, margin=margin)[0]), bpos, bmass, name="pallas deposit blocks only")
g = timeit(jax.jit(lambda b: bpm._assemble(b, ncell=nc, ng=ng, margin=margin)), blocks, name="_assemble only")
fields = jax.random.normal(jax.random.PRNGKey(2), (3, ng, ng, ng))
fb = timeit(jax.jit(lambda f: jnp.stack([bpm._extract(f[i], ncell=nc, ng=ng, margin=margin) for i in range(3)], axis=1)), fields, name="_extract x3 only")
v = timeit(jax.jit(lambda fb, bp: pallas_gather_fields(fb, bp, ncell=nc, ng=ng, box_size=box, margin=margin)), fb, bpos, name="pallas gather only")
# FFT for context
rho = jax.random.normal(jax.random.PRNGKey(3), (ng, ng, ng))
timeit(jax.jit(lambda r: jnp.fft.irfftn(jnp.fft.rfftn(r), s=(ng,ng,ng))), rho, name="fwd+inv FFT 192^3")
