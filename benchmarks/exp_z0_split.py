#!/usr/bin/env python
"""Clustered-state force-split re-optimization (VERDICT r4 item 4).

The Gaussian-split optimum that put the HEADLINE (unclustered) 1M step
at pm_grid=192 is wrong at z=0: short-range pair work scales with the
local density inside r_cut = 4.5 * 1.25 * box/ng, so once halos form,
shrinking r_cut (finer PM) trades pair slots ~ (192/ng)^3 against PM
cost ~ (ng/192)^3 from a 507 ms short-range baseline — the optimum
moves to finer grids. This experiment measures the real z=0 tradeoff
ON the flagship run's saved final state (science_record.npz — no
re-evolve needed) for a ladder of (pm_grid, ncell) geometries.

Usage: python benchmarks/exp_z0_split.py [record.npz]
Emits one JSON line per geometry + a final summary line.
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
    from lambda_cdm_tpu.ops.bucketed_pm import pm_accelerations_bucketed
    from lambda_cdm_tpu.ops.fast_treepm import (fast_plan, fast_run,
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
    n = pos.shape[0]
    pos_np = np.asarray(pos)
    params = CosmologyParams()
    log(f"z=0 state: n={n}, box={box}, a={a_f:.4f} (from {rec_path})")

    results = []
    for ng in (192, 256, 320):
        # pre-size capacity at the plan's ncell (grow-and-retry fixpoint)
        cap_req = 0
        plan = None
        for _ in range(6):
            try:
                plan = fast_plan(n, box, ng, capacity=cap_req)
            except ValueError as e:
                log(f"ng={ng}: no admissible plan ({e})")
                plan = None
                break
            nc = plan["ncell"]
            cid = np.clip((pos_np / box * nc).astype(np.int64), 0, nc - 1)
            occ = np.bincount(
                (cid[:, 0] * nc + cid[:, 1]) * nc + cid[:, 2],
                minlength=nc ** 3)
            need = int(occ.max())
            if need <= plan["capacity"]:
                break
            cap_req = 128 * ((need + 127) // 128)
        if plan is None:
            continue
        nc, cap = plan["ncell"], plan["capacity"]
        state_gb = nc ** 3 * cap * 44 / 2 ** 30
        log(f"ng={ng}: ncell={nc} cap={cap} variant={plan['variant']} "
            f"maxocc={need} state={state_gb:.1f} GB")
        if state_gb > 9.5:
            log(f"ng={ng}: skipped (state too big for one v5e next to "
                f"transients)")
            print(json.dumps({"ng": ng, "ncell": nc, "capacity": cap,
                              "skipped": f"state {state_gb:.1f} GB"}),
                  flush=True)
            continue
        row = {"ng": ng, "ncell": nc, "capacity": cap,
               "variant": plan["variant"], "max_occ": need}
        fstate = fs = None
        try:
            t0 = time.perf_counter()
            fstate, kw = initialize_fast(
                pos, vel, mass, a_f, box_size=box, pm_grid=ng,
                softening=softening, capacity=cap_req,
                kick_mode="comoving")
            sync(fstate.acc)
            assert int(fstate.overflow) == 0, "overflow"
            # step timing: one 8-step segment through fast_run (no
            # rebucket inside; cadence carried at 0)
            fs = fast_run(fstate, params, 1e-6, n_steps=8,
                          rebucket_every=64, **kw)
            sync(fs.bpos)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            fs = fast_run(fs, params, 1e-6, n_steps=16,
                          rebucket_every=64,
                          steps_since_rebucket=8, **kw)
            sync(fs.bpos)
            dt_step = (time.perf_counter() - t0) / 16
            row["step_ms"] = round(dt_step * 1e3, 1)
            row["compile_s"] = round(compile_s, 1)
            # standalone short-range for the attribution
            if any(d.platform == "tpu" for d in jax.devices()):
                from lambda_cdm_tpu.ops.pallas_short_range import \
                    pallas_short_range
                f_short = jax.jit(lambda bp, bm: pallas_short_range(
                    bp.reshape(3, nc ** 3, cap),
                    bm.reshape(nc ** 3, cap), ncell=nc, capacity=cap,
                    box_size=float(box), rs=float(kw["rs"]),
                    softening=float(softening),
                    variant=plan["variant"]))
                sync(f_short(fs.bpos, fs.bmass))
                t0 = time.perf_counter()
                for _ in range(3):
                    r = f_short(fs.bpos, fs.bmass)
                sync(r)
                row["short_range_ms"] = round(
                    (time.perf_counter() - t0) / 3 * 1e3, 1)
            f_pm = jax.jit(lambda bp, bm: pm_accelerations_bucketed(
                bp, bm, ncell=nc, ng=ng, box_size=box,
                g_const=kw["g_const"], split_scale=kw["rs"],
                margin=kw["margin"], gradient=kw["gradient"])[0])
            sync(f_pm(fs.bpos, fs.bmass))
            t0 = time.perf_counter()
            for _ in range(3):
                r = f_pm(fs.bpos, fs.bmass)
            sync(r)
            row["pm_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 1)
        except Exception as e:  # noqa: BLE001
            row["error"] = repr(e)[:300]
        log(f"  -> {row}")
        print(json.dumps(row), flush=True)
        results.append(row)
        # free before the next geometry
        fstate = fs = None
    ok = [r for r in results if "step_ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["step_ms"])
        print(json.dumps({"best_ng": best["ng"],
                          "best_step_ms": best["step_ms"],
                          "rows": results}), flush=True)


if __name__ == "__main__":
    main()
