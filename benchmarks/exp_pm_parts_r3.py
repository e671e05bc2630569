"""PM sub-part timings at the round-3 headline geometry (192^3, nc=32,
cap=64, ppc=6): deposit rods -> assemble -> rfftn -> Green -> irfftn ->
fused fd4 gather."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bpm
from lambda_cdm_tpu.ops.pallas_pm_rods import (assemble_rods,
                                               pallas_deposit_rods,
                                               pallas_gather_fd4)
from lambda_cdm_tpu.ops.matmul_fft import irfftn, rfftn

n, box, ng, nc, cap, margin = 1_000_000, 100.0, 192, 32, 64, 1
pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, _, ovf = jax.jit(bucket_particles,
                              static_argnames=("ncell", "capacity"))(
    pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1])
b3 = bpos.reshape(nc**3, cap, 3); bm = bmass.reshape(nc**3, cap)
counts = jnp.sum(bm > 0, axis=1).astype(jnp.int32)

_re1 = jax.jit(lambda x: jnp.real(x).ravel()[0:1])
def sync(x): np.asarray(jax.device_get(
    _re1(jax.tree_util.tree_leaves(x)[0])))
def timeit(f, *a, reps=10, name=""):
    out = f(*a); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = f(*a)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")
    return out

blocks = timeit(jax.jit(lambda p, q, c: pallas_deposit_rods(
    p, q, ncell=nc, ng=ng, box_size=box, margin=margin, counts=c)[0]),
    b3, bm, counts, name="deposit rods")
grid = timeit(jax.jit(lambda b: assemble_rods(b, ncell=nc, ng=ng,
                                              margin=margin)),
              blocks, name="assemble rods")
rho_k = timeit(jax.jit(lambda g: rfftn(g)), grid, name="rfftn 192^3")
green = bpm._greens(ng, box, 1.25 * box / ng)
phi = timeit(jax.jit(lambda rk: irfftn(green * rk, s=(ng, ng, ng))),
             rho_k, name="green+irfftn")
acc = timeit(jax.jit(lambda f, p, c: pallas_gather_fd4(
    f, p, ncell=nc, ng=ng, box_size=box, margin=margin, counts=c)),
    phi, b3, counts, name="fused fd4 gather")
