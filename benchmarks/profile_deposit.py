import sys
sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bp

def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0:1]))

def bench(f, label, reps=3):
    t0 = time.perf_counter(); out = f(); sync(out)
    print(f"{label}: compile+1 {time.perf_counter()-t0:.1f}s", flush=True)
    t = time.perf_counter()
    for _ in range(reps): out = f(); sync(out)
    print(f"{label}: {(time.perf_counter()-t)/reps*1e3:.1f} ms", flush=True)

key = jax.random.PRNGKey(0)
n, box, ng = 1_000_000, 100.0, 256
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 8.6)
ncell, cap, margin = 32, 80, 1
bpos, bmass, _, _ = bucket_particles(pos, m, box, ncell=ncell, capacity=cap)
sync(bpos)

ppc, ell = bp.block_geometry(ng, ncell, margin)
cc = ncell ** 3

@jax.jit
def factors_only(bpos, bmass):
    x, y, zm, d = bp._cic_factors(bpos, bmass, ncell=ncell, ng=ng,
                                  box_size=box, margin=margin)
    return x.sum() + y.sum() + zm.sum()

@jax.jit
def local_only(bpos, bmass):
    x, y, zm, d = bp._cic_factors(bpos, bmass, ncell=ncell, ng=ng,
                                  box_size=box, margin=margin)
    chunk = bp._cell_chunks(cc)
    def chunk_local(args):
        xc, yc, zc = args
        m1 = (xc[:, :, :, None] * yc[:, :, None, :]).reshape(chunk, cap, ell*ell)
        return jnp.einsum("cka,ckz->caz", m1, zc,
                          preferred_element_type=jnp.float32)
    xs = (x.reshape(-1, chunk, cap, ell), y.reshape(-1, chunk, cap, ell),
          zm.reshape(-1, chunk, cap, ell))
    return jax.lax.map(chunk_local, xs).reshape(cc, ell, ell, ell)

local = local_only(bpos, bmass); sync(local)

@jax.jit
def assemble_only(local):
    return bp._assemble(local, ncell=ncell, ng=ng, margin=margin)

@jax.jit
def extract_only(grid):
    return bp._extract(grid, ncell=ncell, ng=ng, margin=margin)

grid = jax.random.normal(jax.random.PRNGKey(1), (ng, ng, ng))

bench(lambda: factors_only(bpos, bmass), "factors")
bench(lambda: local_only(bpos, bmass), "factors+outer+gemm")
bench(lambda: assemble_only(local), "assemble")
bench(lambda: extract_only(grid), "extract")
bench(lambda: jnp.fft.rfftn(grid), "rfftn")
