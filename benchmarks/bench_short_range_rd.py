"""TPU micro-benchmark: rod-dense short-range kernel vs the vpu3
cell-bucket kernel at the 1M bench geometry (box=100, pm 192^3).

Usage: python benchmarks/bench_short_range_rd.py [n] [ncell] [iters]
Defaults: 1_000_000 24 10. Run small first (e.g. 32768 8 3) to validate
Mosaic lowering before committing the device to the big compile.

Timing per CLAUDE.md: warm with the exact timed call, sync via a host
readback (axon block_until_ready does not reliably block).
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
    ncell = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    box = 100.0
    pm_grid = 192
    rs = 1.25 * box / pm_grid
    r_cut = 4.5 * rs
    soft = 0.01
    assert box / ncell >= r_cut, "cells must be >= r_cut"

    from lambda_cdm_tpu.ops import pallas_short_range_rd as rd

    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jnp.ones((n,), jnp.float32)

    k_rod = rd.rd_geometry(n, ncell)
    print(f"n={n} ncell={ncell} rods={ncell*ncell} k_rod={k_rod} "
          f"r_cut={r_cut:.3f} window_tiles~"
          f"{(2*r_cut/box*n/ncell**2)/128:.2f}", flush=True)

    rpos, rmass, counts, rzq, overflow, src = rd.rd_pack(
        pos, m, box, ncell=ncell, k_rod=k_rod)
    assert int(overflow) == 0
    tables = rd.rd_window_tables(rzq, counts, ncell=ncell, k_rod=k_rod,
                                 box_size=box, window=r_cut)
    _sync(tables)
    print("packed; compiling rd kernel...", flush=True)

    t0 = time.perf_counter()
    acc = rd.pallas_short_range_rd(
        rpos, rmass, counts, tables, ncell=ncell, k_rod=k_rod,
        box_size=box, rs=rs, softening=soft)
    _sync(acc)
    print(f"rd compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        acc = rd.pallas_short_range_rd(
            rpos, rmass, counts, tables, ncell=ncell, k_rod=k_rod,
            box_size=box, rs=rs, softening=soft)
    _sync(acc)
    dt_rd = (time.perf_counter() - t0) / iters * 1e3
    print(f"rd: {dt_rd:.2f} ms/call", flush=True)

    # spot correctness on device: one random live slot vs erfc oracle
    from lambda_cdm_tpu.forces.treepm import short_range_factor
    i = int(np.asarray(counts)[0]) // 2
    p0 = np.asarray(rpos[0, i])
    a0 = np.asarray(acc[0, i])
    d = np.asarray(pos) - p0[None, :]
    d -= box * np.round(d / box)
    r2 = (d * d).sum(1) + soft * soft
    r = np.sqrt(r2)
    w = np.asarray(short_range_factor(jnp.asarray(r), rs)) / (r2 * r)
    w[r2 <= soft * soft * 1.0000001] = 0.0
    ref = (w[:, None] * d).sum(0)
    err = np.abs(a0 - ref).max() / (np.abs(ref).max() + 1e-12)
    print(f"spot check rel err: {err:.2e}", flush=True)

    # vpu3 comparison at the bench cell geometry (ncell must be %8)
    if ncell % 8 == 0:
        from lambda_cdm_tpu.forces.treepm import bucket_particles
        from lambda_cdm_tpu.ops.pallas_short_range import \
            pallas_short_range
        mean_occ = n / ncell ** 3
        cap = max(128, int(np.ceil(1.75 * mean_occ / 128)) * 128)
        bpos, bmass, pslot, ovf = bucket_particles(
            pos, m, box, ncell=ncell, capacity=cap)
        assert int(ovf) == 0
        print(f"vpu3 cap={cap}; compiling...", flush=True)
        t0 = time.perf_counter()
        a3 = pallas_short_range(bpos, bmass, ncell=ncell, capacity=cap,
                                box_size=box, rs=rs, softening=soft)
        _sync(a3)
        print(f"vpu3 compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            a3 = pallas_short_range(bpos, bmass, ncell=ncell,
                                    capacity=cap, box_size=box, rs=rs,
                                    softening=soft)
        _sync(a3)
        dt_v3 = (time.perf_counter() - t0) / iters * 1e3
        print(f"vpu3: {dt_v3:.2f} ms/call  speedup rd: "
              f"{dt_v3/dt_rd:.2f}x", flush=True)


if __name__ == "__main__":
    main()
