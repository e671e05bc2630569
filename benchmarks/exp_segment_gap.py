#!/usr/bin/env python
"""Attribute the fused-segment overhead at the z=0 state.

exp_z0_split measured the production z=0 step at 3173 ms while the
standalone short-range (845.9) + PM (86.6) programs account for only
932 ms — a 2.2 s/step gap INSIDE the fused KDK segment. Candidates:
KDK elementwise passes over the [3, C, K] state (~tens of ms at most),
PM-in-segment scheduling, short-range-in-segment relayout/VMEM
pressure, scan carry copies. This experiment splits it:

  (a) pm_only=True segment (PM + KDK, no short-range kernel)
  (b) full segment, n_steps=1 vs 16 (fixed vs per-step costs)
  (c) a jitted KDK-only pass (no force call at all)

Usage: python benchmarks/exp_segment_gap.py [record.npz]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # noqa: BLE001
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def main():
    import science_run as sr
    from lambda_cdm_tpu.ops.fast_treepm import (fast_run,
                                                initialize_fast)
    from lambda_cdm_tpu.physics.cosmology import CosmologyParams

    rec_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "science_record.npz")
    rec = sr.load_record(rec_path)
    box = float(rec["geometry"]["box"])
    softening = float(rec["geometry"]["softening"])
    pos = jnp.asarray(rec["pos_f"])
    vel = jnp.asarray(rec["vel_f"])
    mass = jnp.asarray(rec["masses"])
    a_f = float(rec["a_f"])
    params = CosmologyParams()
    out = {}

    def timed_steps(tag, fstate, kw, n_steps, reps=2):
        fs = fast_run(fstate, params, 1e-6, n_steps=n_steps,
                      rebucket_every=10_000, **kw)
        sync(fs.bpos)                      # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fs = fast_run(fs, params, 1e-6, n_steps=n_steps,
                          rebucket_every=10_000, **kw)
        sync(fs.bpos)
        ms = (time.perf_counter() - t0) / (reps * n_steps) * 1e3
        out[tag] = round(ms, 1)
        log(f"{tag}: {ms:.1f} ms/step")
        return fs

    # production geometry (plan pre-sized like the flagship: cap from
    # the engine's grow fixpoint; the record state ran cap 8192/nc 16)
    fstate, kw = initialize_fast(pos, vel, mass, a_f, box_size=box,
                                 pm_grid=192, softening=softening,
                                 capacity=8192, kick_mode="comoving")
    sync(fstate.acc)
    assert int(fstate.overflow) == 0
    log(f"plan: ncell={kw['ncell']} cap={kw['capacity']} "
        f"variant={kw['variant']}")
    out["ncell"] = kw["ncell"]
    out["capacity"] = kw["capacity"]

    timed_steps("full_16", fstate, kw, 16)
    timed_steps("full_1", fstate, kw, 1)

    # PM-only segment on the same bucketed geometry
    fstate_pm, kw_pm = initialize_fast(
        pos, vel, mass, a_f, box_size=box, pm_grid=192,
        softening=softening, capacity=8192, kick_mode="comoving",
        pm_only=True)
    sync(fstate_pm.acc)
    timed_steps("pm_only_16", fstate_pm, kw_pm, 16)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
