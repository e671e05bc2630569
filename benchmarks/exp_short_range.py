"""TPU experiment: short-range kernel variants at the 1M bench config."""
import time
import sys; sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("devices:", jax.devices())

from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range

n, box, ng = 1_000_000, 100.0, 192
nc, cap = 24, 128
rs = 1.25 * box / ng
key = jax.random.PRNGKey(0)
pos = jax.random.uniform(key, (n, 3), maxval=box)
m = jnp.full((n,), 1.0)
bpos, bmass, pslot, ovf = jax.jit(
    bucket_particles, static_argnames=("ncell", "capacity"))(
        pos, m, box, ncell=nc, capacity=cap)
np.asarray(bpos.ravel()[0:1])
print("bucketed, overflow:", int(ovf))

def sync(x):
    np.asarray(jax.device_get(x.ravel()[0:1]))

results = {}
for variant in ("vpu", "vpu2", "vpu2-112"):
    vname, _, lc = variant.partition("-")
    lcv = int(lc) if lc else 0
    f = jax.jit(lambda bp, bm, vname=vname, lcv=lcv: pallas_short_range(
        bp, bm, ncell=nc, capacity=cap, box_size=box, rs=float(rs),
        softening=0.05, variant=vname, live_cap=lcv))
    t0 = time.perf_counter()
    out = f(bpos, bmass); sync(out)
    print(f"{variant}: compile+run {time.perf_counter()-t0:.1f}s")
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(bpos, bmass)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    results[variant] = (dt, out)
    print(f"{variant}: {dt:.1f} ms")

# accuracy delta between variants
d = np.abs(np.asarray(results["vpu2"][1]) - np.asarray(results["vpu"][1]))
live = np.asarray(bmass) > 0
print("vpu2-vs-vpu max |diff| (live):", d[live].max(),
      "scale:", np.abs(np.asarray(results["vpu"][1])).max())
