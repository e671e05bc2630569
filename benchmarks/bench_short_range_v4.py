"""TPU micro-benchmark: paired-z-cell short-range kernel (vpu4,
ncell=32/cap=64) vs the production vpu3 (ncell=24/cap=128) at the 1M
bench force-split (box=100, pm 192^3 -> rs=0.651, r_cut=2.93).

Usage: python benchmarks/bench_short_range_v4.py [n] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x):
    np.asarray(x.ravel()[0:1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    box = 100.0
    rs = 1.25 * box / 192
    soft = 0.01

    from lambda_cdm_tpu.forces.treepm import bucket_particles
    from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jnp.ones((n,), jnp.float32)

    results = {}
    for tag, ncell, cap, variant, chs in (
            ("vpu3", 24, 128, "vpu3", (16,)),
            ("vpu4", 32, 64, "vpu4", (16,)), ("vpu4b", 32, 64, "vpu4b", (16, 8))):
        bpos, bmass, pslot, ovf = bucket_particles(
            pos, m, box, ncell=ncell, capacity=cap)
        assert int(ovf) == 0, f"{tag}: overflow {int(ovf)}"
        for ch in chs:
            kw = dict(ncell=ncell, capacity=cap, box_size=box, rs=rs,
                      softening=soft, variant=variant, i_chunk=ch)
            t0 = time.perf_counter()
            acc = pallas_short_range(bpos, bmass, **kw)
            _sync(acc)
            print(f"{tag} ch={ch}: compile+first "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(iters):
                acc = pallas_short_range(bpos, bmass, **kw)
            _sync(acc)
            dt = (time.perf_counter() - t0) / iters * 1e3
            results[f"{tag}_ch{ch}"] = dt
            print(f"{tag} ch={ch}: {dt:.2f} ms/call", flush=True)
        if tag == "vpu4":
            # spot-check one live slot on device against the erfc oracle
            from lambda_cdm_tpu.forces.treepm import short_range_factor
            i = int(np.argmax(np.asarray(bmass[0] > 0)))
            p0 = np.asarray(bpos[0, i])
            a0 = np.asarray(acc[0, i])
            d = np.asarray(pos) - p0[None, :]
            d -= box * np.round(d / box)
            r2 = (d * d).sum(1) + soft * soft
            r = np.sqrt(r2)
            w = np.asarray(short_range_factor(jnp.asarray(r), rs)) \
                / (r2 * r)
            w[r2 <= soft * soft * 1.0000001] = 0.0
            ref = (w[:, None] * d).sum(0)
            err = np.abs(a0 - ref).max() / (np.abs(ref).max() + 1e-12)
            print(f"vpu4 spot rel err: {err:.2e}", flush=True)
    base = results.get("vpu3_ch16")
    if base:
        for k, v in results.items():
            print(f"{k}: {v:.2f} ms  ({base/v:.2f}x vs vpu3)", flush=True)


if __name__ == "__main__":
    main()
