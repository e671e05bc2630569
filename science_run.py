#!/usr/bin/env python
"""Flagship on-chip science run: the headline 1M-particle Lambda-CDM box
evolved z~24 -> 0 ON the TPU through the SimulationEngine with analysis
observers on, then science-validated end to end.

This is the composition the reference only gestures at (its de-facto
integration test, /root/reference/examples/cuda_nbody_test.cpp:9-101,
evolves 10k random particles for 10 steps and checks energy; README.md
:177-185 sketches analyzers as observers that were never wired). Here the
FULL production pipeline runs at the headline geometry on one chip:

  2LPT ICs -> treepm_fast (persistent cell-list stepper, adaptive dt)
  -> P(k) observer at cadence -> Layzer-Irvine energy ledger (pairwise
  U, the force-consistency metric) -> final FoF/SO catalog (auto-sized)
  + HMF vs Sheth-Tormen at z=0 -> Born convergence map,

and every science check is asserted and recorded in ONE machine-readable
certificate, SCIENCE.json.

Crash containment (round-5 redesign; the first TWO flagship attempts
each lost a >1000 s evolve to a crash in a late analysis stage):

  * the evolve phase writes its complete output — final state, IC and
    snapshot spectra, Layzer-Irvine samples, engine statistics — to a
    RECORD file (science_record.npz) BEFORE any analysis runs;
  * `--analyze-only` re-runs the analysis/certificate phase from that
    record in seconds, with no re-evolve;
  * 2LPT ICs are cached per (seed, geometry) under .jax_cache/ — the
    round-4 flagship spent 867.8 s regenerating identical ICs.

Science checks (asserted, recorded):
  * large-scale P(k) growth vs the ODE-exact (D(a_f)/D(a_i))^2 — STRICT
    bars at a mid-run z~1.3 snapshot (genuinely linear window), measured
    quasi-linear envelope bars at z=0 (BASELINE.md round-4 attribution),
  * small-scale nonlinear excess (no PM over-damping, no blow-up),
  * HMF vs Sheth-Tormen at z=0 over >= 32-particle halos,
  * Layzer-Irvine invariant C = T + U + int H(2T+U) dt to a few % of |U|,
  * zero bucket overflows / dropped deposits across the whole run,
  * finite Born convergence map with nonzero structure.

Run: python science_run.py                 (full 1M run, TPU, minutes)
     python science_run.py --small         (64^3 smoke, any backend)
     python science_run.py --analyze-only  (re-analyze the saved record)
Writes SCIENCE.json (repo root) and exits nonzero on any failed check.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))

if "--cpu" in sys.argv:
    # env vars are too late here (the host pre-imports jax bound to the
    # axon TPU); jax.config before first device use is the only switch
    jax.config.update("jax_platforms", "cpu")

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:  # noqa: BLE001 -- cache is an optimization only
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Layzer-Irvine ledger (observer with scale-factor-spaced sampling)
# ---------------------------------------------------------------------------

class LayzerIrvineLedger:
    """Tracks C = T + U + int H (2T+U) dt across the run.

    U is the pairwise min-image potential (forces/direct.potential_energy,
    row-blocked; ~seconds per eval at 1M on a v5e), sampled every
    `dlna_sample` e-folds of expansion -- NOT every chunk -- so the
    energy audit costs O(20) evals per run. The per-interval integral
    of H(2T+U)dt = (2T+U)/a da uses the analytic 1/a^2, 1/a forms with
    trapezoid comoving coefficients (tests/test_energy_longhorizon.py's
    scheme: a plain trapezoid cannot resolve 1/a^2 across large early
    a-leaps)."""

    def __init__(self, engine, dlna_sample: float = 0.15):
        self.engine = engine
        self.dlna = dlna_sample
        self.samples: list[dict] = []
        self._prev = None
        self._li = 0.0
        self._c0 = None
        self.worst = 0.0
        self.wall_s = 0.0

    def sample(self, force: bool = False):
        from lambda_cdm_tpu.forces.direct import (kinetic_energy,
                                                  potential_energy)
        a = float(self.engine.state.scale_factor)
        if (not force and self._prev is not None
                and math.log(a / self._prev[0]) < self.dlna):
            return
        t_in = time.perf_counter()
        st = self.engine.state
        cfg = self.engine.config
        ke = float(kinetic_energy(st.velocities, st.masses))
        # chunk 128 bounds the row-block intermediates to ~0.5 GB at 1M
        # (the engine's compute_energy default chunk of 2048 would peak
        # ~8 GB next to the resident state + the 4096-capacity buckets
        # on a 16 GB v5e)
        pe = float(potential_energy(
            st.positions, st.masses, cfg.particles.box_size,
            cfg.forces.softening_length, cfg.units.G, chunk_size=128))
        t_pec = ke / (a * a)                # comoving-kick u = a^2 dx/dt
        u_phys = pe / a
        if self._prev is not None:
            a_p, t_p, u_p = self._prev
            tc = 0.5 * (t_pec * a * a + t_p * a_p * a_p)
            uc = 0.5 * (u_phys * a + u_p * a_p)
            self._li += (2 * tc * 0.5 * (1 / a_p ** 2 - 1 / a ** 2)
                         + uc * (1 / a_p - 1 / a))
        if self._c0 is None:
            self._c0 = t_pec + u_phys
        resid = abs(t_pec + u_phys + self._li - self._c0) / abs(u_phys)
        self.worst = max(self.worst, resid)
        self.samples.append({"a": a, "T": t_pec, "U": u_phys,
                             "residual": resid})
        self._prev = (a, t_pec, u_phys)
        self.wall_s += time.perf_counter() - t_in
        log(f"  [LI] a={a:.4f}  T={t_pec:.4e}  U={u_phys:.4e}  "
            f"resid={resid:.3e}")


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def geometry(small: bool) -> dict:
    if small:
        # the tests/test_science_hmf.py geometry (40^3, 62.5 Mpc/h) --
        # CPU-runnable plumbing + physics smoke; the 1M branch is the
        # certificate
        return dict(n_side=40, ng_ic=80, box=62.5, pm_grid=0,
                    pk_grid=64, softening=0.3, chunk=50,
                    # pre-size the bucket capacity for z=0 clustering:
                    # the grow ladder otherwise recompiles every rung
                    # (~1-4 min each on the axon tunnel); vpu5's
                    # occupancy-windowed costs make the big static cap
                    # nearly free
                    bucket_capacity=2048)
    # the headline geometry: 100^3 = 1M particles, 100 Mpc/h box,
    # 192^3 PM (BASELINE.md); softening = spacing/10 keeps the
    # acceleration-limited adaptive dt inside a minutes budget while
    # resolving >= 20-particle halos. Capacity pre-sized 8192: the
    # measured run breached 4096 already at a=0.43 ([24^3, 8192] x 44 B
    # = 5 GB; vpu5's occupancy-windowed costs don't scale with the
    # static cap, and a mid-run growth rung costs a ~5 min recompile)
    return dict(n_side=100, ng_ic=200, box=100.0, pm_grid=192,
                pk_grid=256, softening=0.1, chunk=50,
                bucket_capacity=8192)


Z_INIT = 24.0


def _ic_cache_path(seed: int, g: dict, a_i: float, params) -> str:
    key = (f"2lpt|{seed}|{g['ng_ic']}|{g['n_side']}|{g['box']}|"
           f"{a_i:.8f}|comoving|{params.omega_m}|{params.omega_lambda}|"
           f"{params.h}|{params.sigma8}|{params.n_s}")
    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    d = os.path.join(ROOT, ".jax_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"ics_{h}.npz")


# ---------------------------------------------------------------------------
# Phase 1: evolve (writes the record BEFORE any analysis can crash)
# ---------------------------------------------------------------------------

def evolve_phase(small: bool, record_path: str) -> dict:
    from lambda_cdm_tpu.analysis.power_spectrum import \
        measure_power_spectrum
    from lambda_cdm_tpu.core.analysis_observers import PowerSpectrumObserver
    from lambda_cdm_tpu.core.config import SimulationConfig
    from lambda_cdm_tpu.core.engine import SimulationEngine
    from lambda_cdm_tpu.core.state import make_state
    from lambda_cdm_tpu.physics import initial_conditions as ics
    from lambda_cdm_tpu.physics.cosmology import CosmologyParams

    g = geometry(small)
    n_side, ng_ic, box = g["n_side"], g["ng_ic"], g["box"]
    pm_grid, pk_grid = g["pm_grid"], g["pk_grid"]
    softening, chunk = g["softening"], g["chunk"]
    # plumbing knob: stop early so the full script path can be exercised
    # in minutes; z=0-dependent checks are then recorded but NOT
    # asserted (analyze_phase's check_z0 / mid-z gating)
    z_final = float(os.environ.get("LCDM_SCIENCE_ZFINAL", "0.0"))
    a_i = 1.0 / (1.0 + Z_INIT)
    params = CosmologyParams()

    t_wall0 = time.perf_counter()
    seed = 2026
    ic_path = _ic_cache_path(seed, g, a_i, params)
    ic_cached = os.path.exists(ic_path)
    log(f"[1/3] 2LPT ICs: {n_side}^3 particles, box={box}, z={Z_INIT}"
        + (" (cache hit)" if ic_cached else ""))
    if ic_cached:
        with np.load(ic_path) as z:
            pos = jnp.asarray(z["pos"])
            vel = jnp.asarray(z["vel"])
    else:
        pos, vel = ics.lpt_displacements(
            jax.random.PRNGKey(seed), params, ng=ng_ic, n_side=n_side,
            box_size=box, a_init=a_i, kick_mode="comoving")
        np.savez(ic_path, pos=np.asarray(pos), vel=np.asarray(vel))
    n = pos.shape[0]
    m_p = 27.7536 * params.omega_m * box ** 3 / n    # [1e10 Msun/h]
    mass = jnp.full((n,), m_p, jnp.float32)
    # no shot-noise subtraction on the IC spectrum: a displaced lattice
    # has suppressed (non-Poisson) discreteness noise below the particle
    # Nyquist, and subtracting 1/nbar there can zero/negate the small-
    # scale bins the nonlinear-excess ratio divides by
    pk_i = measure_power_spectrum(pos, box, ng=pk_grid, num_bins=32,
                                  subtract_shot_noise=False)
    t_ic = time.perf_counter() - t_wall0

    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.forces.type = "treepm_fast"
    cfg.forces.softening_length = softening
    cfg.forces.pm_grid_size = pm_grid
    # pre-size ONLY on TPU: vpu5's occupancy-windowed costs make a big
    # static cap ~free there and a mid-run growth rung costs a ~5 min
    # tunnel recompile — but the CPU jnp short-range grinds every
    # padded slot (C*K*27*K), so cap 2048 at the smoke geometry is
    # ~5.8e10 pair-slots PER STEP (~10 min/step; measured, round 5).
    # CPU smokes take the auto plan + cheap grow-ladder instead.
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg.forces.bucket_capacity = g["bucket_capacity"] if on_tpu else 0
    # big pre-sized capacities make the rebucket pass expensive; the
    # engine's vmax drift guard SHRINKS the cadence whenever safety
    # requires, so the config value is just the amortization ceiling
    cfg.forces.rebucket_every = 16 if small else 64
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = Z_INIT
    cfg.cosmology.final_redshift = z_final
    cfg.integration.kick_mode = "comoving"
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.03
    cfg.integration.min_timestep = 1e-9
    cfg.integration.max_timestep = 1e-3
    cfg.simulation.output_frequency = chunk
    cfg.simulation.checkpoint_frequency = 0
    cfg.io.snapshots.enabled = False
    cfg.profiling.output_file = ""
    cfg.compute.tpu.compilation_cache_dir = os.path.join(ROOT,
                                                         ".jax_cache")

    # estimator-consistent with pk_i (no shot-noise subtraction, same
    # grid/bins) so mid-run snapshot/IC per-bin ratios are clean.
    # frequency=1 = fire at EVERY chunk boundary: observers are invoked
    # per chunk, and keying on the global step counter silently skips
    # boundaries once the steps-to-target clamp shortens a chunk
    # (ADVICE r4) — the mid-z growth check needs a snapshot near a~0.4
    pk_obs = PowerSpectrumObserver(frequency=1, grid_size=pk_grid,
                                   num_bins=32,
                                   subtract_shot_noise=False)
    eng = SimulationEngine(cfg, observers=[pk_obs])
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=a_i))
    li = LayzerIrvineLedger(eng, dlna_sample=0.15)

    from lambda_cdm_tpu.core.observers import Observer

    class LIObserver(Observer):
        def on_step_end(self, engine, step):
            li.sample()

    eng.add_observer(LIObserver())
    li.sample(force=True)

    log(f"[2/3] evolving z={Z_INIT} -> {z_final} (treepm_fast, "
        f"{pm_grid}^3 PM, adaptive dt)")
    t0 = time.perf_counter()
    eng.run(num_steps=1_000_000)
    li.sample(force=True)
    t_evolve = time.perf_counter() - t0
    a_f = float(eng.state.scale_factor)
    steps = int(eng.statistics.total_steps)
    log(f"  evolved to a={a_f:.4f} in {steps} steps, "
        f"{t_evolve:.1f} s wall ({1e3 * t_evolve / max(steps, 1):.1f} "
        f"ms/step incl. analysis)")

    overflow = int(eng._fstate.overflow) if eng._fstate is not None else 0
    dropped = int(eng._fstate.dropped) if eng._fstate is not None else 0

    # clustered-state per-phase breakdown (VERDICT r4 item 4): at the
    # FINAL (most clustered) state, time the compiled chunk, one
    # rebucket, and standalone short-range / PM programs so the
    # production step cost attributes to its phases. Guarded: a tunnel
    # compile failure here must not cost the record.
    breakdown = {}
    if (os.environ.get("LCDM_SCIENCE_BREAKDOWN", "1") == "1"
            and eng._fstate is not None and not small):
        try:
            breakdown = _step_breakdown(eng)
            log(f"  z-final step breakdown: {breakdown}")
        except Exception as exc:  # noqa: BLE001
            breakdown = {"error": repr(exc)[:300]}
            log(f"  step breakdown failed: {exc!r}")

    # the pre-sized buckets (cap 8192 at 1M: ~3.4 GB) are dead weight
    # from here on, and the z=0 FoF compile peaks ~10 GB of lattice
    # temps — with the buckets resident the 16 GB v5e OOM'd at exactly
    # this point in the first full flagship run
    eng.release_force_state()

    record = {
        "small": small,
        "geometry": g,
        "n": n, "m_p": m_p, "a_i": a_i, "a_f": a_f,
        "z_final": z_final,
        "steps": steps,
        "t_ic": t_ic, "t_evolve": t_evolve,
        "ic_cached": ic_cached,
        "overflow": overflow, "dropped": dropped,
        "platform": jax.devices()[0].platform,
        "engine_stats": eng.statistics.to_dict(),
        "li_samples": li.samples, "li_worst": li.worst,
        "li_wall_s": round(li.wall_s, 1),
        "breakdown": breakdown,
        "pk_i": {"k": np.asarray(pk_i.k),
                 "power": np.asarray(pk_i.power),
                 "counts": np.asarray(pk_i.counts)},
        "pk_snapshots": [{"scale_factor": r["scale_factor"],
                          "step": r["step"],
                          "power": np.asarray(r["power"])}
                         for r in pk_obs.results],
        "pos_f": np.asarray(eng.state.positions),
        "vel_f": np.asarray(eng.state.velocities),
        "masses": np.asarray(eng.state.masses),
    }
    _save_record(record_path, record)
    log(f"  evolve record saved: {record_path} "
        f"(crash-proof; re-analyze with --analyze-only)")
    return record


def _step_breakdown(eng) -> dict:
    """Time the production phases on the CURRENT (clustered) fast state:
    compiled chunk ms/step, one rebucket, standalone short-range and
    bucketed-PM programs. Reuses the already-compiled segment; the two
    standalone jits pay one compile each (persisted in the compile
    cache for future runs)."""
    from lambda_cdm_tpu.ops.bucketed_pm import pm_accelerations_bucketed
    from lambda_cdm_tpu.ops.fast_treepm import _rebucket_jit

    fs = eng._fstate
    kw = eng._fast_kw

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))

    out = {}
    # production per-step cost from the run's own stats (no extra
    # stepping: advancing past the stop target would perturb the
    # certified state, and a fresh small-n_steps segment would pay a
    # tunnel compile)
    st = eng.statistics
    if st.total_steps:
        out["run_ms_per_step"] = round(
            1e3 * st.compute_time_s / st.total_steps, 1)

    t0 = time.perf_counter()
    rb = _rebucket_jit(fs, box_size=kw["box_size"], ncell=kw["ncell"],
                       capacity=kw["capacity"],
                       n_rows=int(eng.config.particles.num_particles))
    sync(rb.bpos)
    out["rebucket_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    variant = kw.get("variant", "vpu3")
    nc, cap = kw["ncell"], kw["capacity"]
    if any(d.platform == "tpu" for d in jax.devices()):
        from lambda_cdm_tpu.ops.pallas_short_range import \
            pallas_short_range
        f_short = jax.jit(lambda bp, bm: pallas_short_range(
            bp.reshape(3, nc ** 3, cap), bm.reshape(nc ** 3, cap),
            ncell=nc, capacity=cap, box_size=float(kw["box_size"]),
            rs=float(kw["rs"]), softening=float(kw["softening"]),
            variant=variant))
        sync(f_short(fs.bpos, fs.bmass))           # compile
        t0 = time.perf_counter()
        for _ in range(3):
            r = f_short(fs.bpos, fs.bmass)
        sync(r)
        out["short_range_ms"] = round((time.perf_counter() - t0) / 3
                                      * 1e3, 1)
    f_pm = jax.jit(lambda bp, bm: pm_accelerations_bucketed(
        bp, bm, ncell=nc, ng=kw["ng"], box_size=kw["box_size"],
        g_const=kw["g_const"], split_scale=kw["rs"],
        margin=kw["margin"], gradient=kw["gradient"])[0])
    sync(f_pm(fs.bpos, fs.bmass))                  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        r = f_pm(fs.bpos, fs.bmass)
    sync(r)
    out["pm_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 1)
    out["variant"] = variant
    out["capacity"] = cap
    return out


# ---------------------------------------------------------------------------
# Record I/O (single npz: arrays + one JSON metadata blob)
# ---------------------------------------------------------------------------

def _save_record(path: str, record: dict) -> None:
    arrays = {"pos_f": record["pos_f"], "vel_f": record["vel_f"],
              "masses": record["masses"],
              "pk_i_k": record["pk_i"]["k"],
              "pk_i_power": record["pk_i"]["power"],
              "pk_i_counts": record["pk_i"]["counts"]}
    for i, s in enumerate(record["pk_snapshots"]):
        arrays[f"pk_snap_{i}_power"] = s["power"]
    meta = {k: v for k, v in record.items()
            if k not in ("pos_f", "vel_f", "masses", "pk_i",
                         "pk_snapshots")}
    meta["pk_snap_meta"] = [{"scale_factor": s["scale_factor"],
                             "step": s["step"]}
                            for s in record["pk_snapshots"]]
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, meta_json=np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_record(path: str) -> dict:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        rec = dict(meta)
        rec["pos_f"] = z["pos_f"]
        rec["vel_f"] = z["vel_f"]
        rec["masses"] = z["masses"]
        rec["pk_i"] = {"k": z["pk_i_k"], "power": z["pk_i_power"],
                       "counts": z["pk_i_counts"]}
        rec["pk_snapshots"] = [
            {"scale_factor": m["scale_factor"], "step": m["step"],
             "power": z[f"pk_snap_{i}_power"]}
            for i, m in enumerate(meta["pk_snap_meta"])]
    return rec


# ---------------------------------------------------------------------------
# Phase 2: analysis + certificate
# ---------------------------------------------------------------------------

def analyze_phase(rec: dict) -> dict:
    from lambda_cdm_tpu.analysis import halo_finder
    from lambda_cdm_tpu.analysis.power_spectrum import \
        measure_power_spectrum
    from lambda_cdm_tpu.analysis.theory import \
        mass_function as st_mass_function
    from lambda_cdm_tpu.core.state import make_state
    from lambda_cdm_tpu.physics.cosmology import (CosmologyParams,
                                                  growth_factor_exact)
    from lambda_cdm_tpu.raytracing.lensing import convergence_map_from_state

    small = rec["small"]
    g = rec["geometry"]
    box, pk_grid = g["box"], g["pk_grid"]
    n, m_p = rec["n"], rec["m_p"]
    a_i, a_f, z_final = rec["a_i"], rec["a_f"], rec["z_final"]
    steps = rec["steps"]
    params = CosmologyParams()
    t_an0 = time.perf_counter()

    pos_f = jnp.asarray(rec["pos_f"])
    vel_f = jnp.asarray(rec["vel_f"])
    masses = jnp.asarray(rec["masses"])

    checks: dict[str, dict] = {}

    def check(name, value, ok, bar):
        checks[name] = {"value": value, "pass": bool(ok), "bar": bar}
        log(f"  check {name}: {value} ({'PASS' if ok else 'FAIL'}; "
            f"bar {bar})")

    def record_only(name, value, bar):
        checks[name] = {"value": value, "pass": None,
                        "bar": bar + " [not asserted: early stop]"}
        log(f"  check {name}: {value} (SKIPPED, early stop; bar {bar})")

    z_target_hit = (a_f >= 0.98 or
                    (z_final > 0 and a_f >= 0.97 / (1.0 + z_final)))
    check("completed_to_target", a_f, z_target_hit,
          f"a_final >= {0.98 if z_final == 0 else 0.97/(1+z_final):.3f}"
          f" (z_final={z_final})")
    check("bucket_overflow", rec["overflow"], rec["overflow"] == 0,
          "== 0")
    check("dropped_deposits", rec["dropped"], rec["dropped"] == 0,
          "== 0")

    live = masses > 0
    n_live = int(jnp.sum(live))
    check("particles_conserved", n_live, n_live == n, f"== {n}")

    # completion gate: with LCDM_SCIENCE_ZFINAL the run stops early for
    # plumbing smokes -- z=0-dependent science (nonlinear excess, halos,
    # HMF) is then recorded informationally but NOT asserted (a z=10
    # box has no >= 20-particle halos BY PHYSICS, not by bug)
    at_z0 = a_f >= 0.98

    def check_z0(name, value, ok, bar):
        if at_z0:
            check(name, value, ok, bar)
        else:
            record_only(name, value, bar)

    # -- P(k) growth ---------------------------------------------------------
    log("[a] P(k) science checks")
    # same estimator settings as pk_i (no shot-noise subtraction): the
    # per-bin RATIO is the observable
    pk_f = measure_power_spectrum(pos_f, box, ng=pk_grid, num_bins=32,
                                  subtract_shot_noise=False)
    k = np.asarray(rec["pk_i"]["k"])
    p_i_arr = np.asarray(rec["pk_i"]["power"])
    p_i_counts = np.asarray(rec["pk_i"]["counts"])
    ratio = np.asarray(pk_f.power) / np.maximum(p_i_arr, 1e-30)
    growth = (float(growth_factor_exact(params, a_f))
              / float(growth_factor_exact(params, a_i))) ** 2
    # linear window at z=0: even k < 0.15 at a 100 Mpc/h box is only
    # QUASI-linear by z=0 -- the round-4 flagship measured -12.6% mean /
    # -32% worst-bin there, and the solver-attribution probe
    # (benchmarks/probe_pk_direct.py + tests/test_probe_pk_solvers.py)
    # shows the deviation is finite-box quasi-linear physics, not
    # solver error. z=0 bars carry that measured envelope; the STRICT
    # linear-growth assertion lives at the mid-run z ~ 1.3 snapshot,
    # where the window is genuinely linear.
    k_lin = 0.15 if not small else 0.25
    bar_max, bar_mean = (0.45, 0.20) if not small else (0.50, 0.30)
    lin = (k > 0) & (k < k_lin) & np.isfinite(ratio)
    rel = ratio[lin] / growth - 1.0
    check("pk_linear_bins", int(lin.sum()), lin.sum() >= 2, ">= 2")
    check("pk_linear_growth_max_dev",
          float(np.max(np.abs(rel))) if lin.any() else float("nan"),
          lin.any() and np.all(np.abs(rel) < bar_max),
          f"< {bar_max} per bin")
    check("pk_linear_growth_mean_dev",
          float(np.mean(rel)) if lin.any() else float("nan"),
          lin.any() and abs(float(np.mean(rel))) < bar_mean,
          f"|mean| < {bar_mean}")
    nl = (k > 0.3) & (k < 0.7) & np.isfinite(ratio)
    nl_ratio = float(np.mean(ratio[nl])) / growth if nl.any() else 0.0
    check_z0("pk_nonlinear_excess", nl_ratio, 1.0 < nl_ratio < 20.0,
             "in (1, 20) x linear")

    # STRICT linear growth at a mid-run snapshot (a ~ 0.3-0.55, z ~
    # 0.8-2.3): there the k < k_lin window is genuinely linear (the
    # velocity-dispersion scale sigma_d is ~D(a) x 6 Mpc/h, so the
    # quasi-linear k^2 sigma_d^2 corrections that widen the z=0 bars
    # are still percent-level) and the per-bin snapshot/IC ratio must
    # match the ODE growth^2 tightly. Flagship-only: the small box's
    # window is never clean enough. Early stops that never CROSS the
    # window record informationally instead of hard-failing (ADVICE r4:
    # a ZFINAL=3 smoke has no snapshot in [0.28, 0.58] by construction).
    if not small:
        mids = [r for r in rec["pk_snapshots"]
                if 0.28 <= r["scale_factor"] <= 0.58]
        crossed_window = a_f >= 0.58
        if mids:
            r_mid = min(mids, key=lambda r: abs(r["scale_factor"] - 0.4))
            a_m = r_mid["scale_factor"]
            g_m = (float(growth_factor_exact(params, a_m))
                   / float(growth_factor_exact(params, a_i))) ** 2
            ratio_m = (np.asarray(r_mid["power"])
                       / np.maximum(p_i_arr, 1e-30))
            lin_m = (k > 0) & (k < k_lin) & np.isfinite(ratio_m)
            rel_m = ratio_m[lin_m] / g_m - 1.0
            check("pk_linear_growth_midz_a", a_m, lin_m.sum() >= 2,
                  "snapshot with >= 2 linear bins")
            check("pk_linear_growth_midz_max_dev",
                  float(np.max(np.abs(rel_m))) if lin_m.any()
                  else float("nan"),
                  lin_m.any() and np.all(np.abs(rel_m) < 0.25),
                  "< 0.25 per bin (strict, linear regime)")
            check("pk_linear_growth_midz_mean_dev",
                  float(np.mean(rel_m)) if lin_m.any() else float("nan"),
                  lin_m.any() and abs(float(np.mean(rel_m))) < 0.10,
                  "|mean| < 0.10 (strict, linear regime)")
        elif crossed_window:
            check("pk_linear_growth_midz_a", None, False,
                  "no snapshot in a in [0.28, 0.58]")
        else:
            record_only("pk_linear_growth_midz_a", None,
                        "run stopped before a=0.58; no mid-z window")
    # full per-bin diagnostic table (k, evolved/initial ratio vs the
    # ODE growth^2). Empty/zero-k bins are DROPPED (VERDICT r4 weak 5:
    # a k=0.0 row with ratio 0.0 is a binning artifact, not data)
    fin = np.isfinite(ratio) & (k > 0) & (p_i_counts > 0)
    pk_table = {
        "k": [round(float(x), 5) for x in k[fin]],
        "ratio_over_growth": [round(float(x), 5)
                              for x in (ratio[fin] / growth)],
    }

    # -- HMF vs Sheth-Tormen at z=0 -------------------------------------------
    log("[b] FoF/SO catalog + HMF vs Sheth-Tormen at z=0")
    t0 = time.perf_counter()
    t_fof = 0.0
    hmf = {}
    # LCDM_SCIENCE_FOF_PLAN="ncell,capacity" pins the FoF lattice plan
    # (e.g. "32,1024": the Pallas-hook geometry with merged-cell
    # overflow adoption) — the escape hatch when the auto plan's exact
    # jnp-lattice program outruns the remote compiler's patience
    fof_plan_env = os.environ.get("LCDM_SCIENCE_FOF_PLAN", "")
    fof_plan_override = None
    if fof_plan_env:
        nc_s, cap_s = fof_plan_env.split(",")
        fof_plan_override = {"ncell": int(nc_s), "capacity": int(cap_s)}
    # LCDM_SCIENCE_HMF_MODE=labels: HMF/percolation checks straight
    # from FoF labels (host-side numpy group sizes) with NO catalog
    # program — every cert check below is a function of group sizes
    # and m_p alone (SO radii/vmax/spin are extra science the cert
    # does not assert), and the label pass is compile-cached. The
    # escape hatch for the catalog-program compile/execution stalls
    # observed on the tunnel TPU (CLAUDE.md round-5 findings).
    hmf_mode = os.environ.get("LCDM_SCIENCE_HMF_MODE", "catalog")
    # proven-safe TPU defaults (overridable by env): on the real 1M
    # z=0 cosmic web the Pallas FoF hook and the windowed catalog
    # program both hung the tunnel TPU (CLAUDE.md round-5); the
    # scanned-jnp hook (21 x 4.9 s) and the exact profiles completed.
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    fof_hook = os.environ.get("LCDM_SCIENCE_FOF_HOOK",
                              "jnp" if on_tpu else "auto")
    fof_windowed = (None if "LCDM_SCIENCE_FOF_WINDOWED"
                    not in os.environ else
                    os.environ["LCDM_SCIENCE_FOF_WINDOWED"] == "1")
    if fof_windowed is None and on_tpu:
        fof_windowed = False
    try:
        if hmf_mode == "labels":
            cat = None
            b_link = 0.2 * box / n ** (1.0 / 3.0)
            fp = fof_plan_override or halo_finder.fof_plan(
                n, float(box), float(b_link), positions=pos_f,
                live=masses > 0)
            labels, fof_overflow = halo_finder.fof_labels(
                pos_f, box, b_link, ncell=fp["ncell"],
                capacity=fp["capacity"], live=masses > 0,
                hook=fof_hook)
            lab_np = np.asarray(labels)[np.asarray(masses) > 0]
            _, sizes = np.unique(lab_np, return_counts=True)
            sizes = np.sort(sizes[sizes >= 20])[::-1]
            n_h = int(sizes.size)
            t_fof = time.perf_counter() - t0
            log(f"  {n_h} halos >= 20 particles in {t_fof:.1f} s "
                f"(labels-only mode; fof overflow "
                f"{int(fof_overflow)} merged)")
        else:
            cat = halo_finder.find_halos(
                pos_f, vel_f, masses, box, min_particles=20,
                plan=fof_plan_override, hook=fof_hook,
                windowed=fof_windowed)
            n_h = int(cat.num_halos)
            sizes = np.sort(np.asarray(cat.n_particles)[:n_h])[::-1]
            t_fof = time.perf_counter() - t0
            log(f"  {n_h} halos >= 20 particles in {t_fof:.1f} s "
                f"(catalog capacity {int(cat.mass.shape[0])})")
            check("catalog_not_truncated", int(cat.mass.shape[0]),
                  n_h < int(cat.mass.shape[0]), "num_halos < capacity")
        check_z0("num_halos", n_h, n_h >= (10 if small else 500),
                 ">= 500 at 1M (>= 10 small)")
        biggest = int(sizes[0]) if n_h else 0
        check_z0("no_percolation", biggest, 0 < biggest < 0.2 * n,
                 "largest halo < 20% of box")

        # HMF from FoF group masses (count x m_p — identical in both
        # modes; equal-mass particles make cat.mass == n_particles*m_p)
        z_f = max(1.0 / a_f - 1.0, 0.0)
        h_masses = sizes.astype(np.float64) * m_p
        m_lo = 32.0 * m_p
        m_hi = float(h_masses[0]) * (1 + 1e-5) if n_h else m_lo * 10
        nbins_h = 8
        edges = np.logspace(np.log10(m_lo), np.log10(m_hi), nbins_h + 1)
        counts, _ = np.histogram(h_masses, bins=edges)
        centers = np.sqrt(edges[:-1] * edges[1:])
        dlog10 = np.log10(edges[1] / edges[0])
        measured = counts / (box ** 3 * dlog10)
        theory = np.asarray(st_mass_function(
            params, jnp.asarray(centers), z=z_f)) * math.log(10.0)
        ok_bins = counts >= 8
        if ok_bins.sum() >= 2:
            r = measured[ok_bins] / theory[ok_bins]
            sigma = 1.0 / np.sqrt(counts[ok_bins])
            lo_b = 1.0 / 2.5 / (1.0 + 3.0 * sigma)
            hi_b = 2.5 * (1.0 + 3.0 * sigma)
            per_bin_ok = bool(np.all((r > lo_b) & (r < hi_b)))
            gmean = float(np.exp(np.mean(np.log(r))))
            hmf = {"bins": centers[ok_bins].tolist(),
                   "counts": counts[ok_bins].tolist(),
                   "ratio_vs_st": r.tolist()}
            check_z0("hmf_per_bin_vs_st",
                     [round(x, 3) for x in r.tolist()],
                     per_bin_ok, "factor 2.5 + 3 sigma Poisson per bin")
            check_z0("hmf_band_gmean_vs_st", gmean,
                     1 / 1.7 < gmean < 1.7,
                     "geometric mean in (1/1.7, 1.7)")
        else:
            check_z0("hmf_per_bin_vs_st", counts.tolist(), False,
                     ">= 2 bins with >= 8 halos")
    except Exception as exc:  # noqa: BLE001 -- record, don't lose cert
        log(f"  FoF/HMF stage failed: {exc!r}")
        check("fof_stage_ok", repr(exc)[:300], False, "no exception")

    # -- Layzer-Irvine --------------------------------------------------------
    li_bar = 0.05
    li_worst = rec["li_worst"]
    check("layzer_irvine_worst_residual", li_worst, li_worst < li_bar,
          f"< {li_bar} of |U| (pairwise U vs TreePM force: PM split + "
          f"min-image-vs-Ewald systematics; the exactly-consistent "
          f"direct-solver bound is 1e-3, tests/test_energy_longhorizon)")

    # -- lensing --------------------------------------------------------------
    log("[c] Born convergence map from the final state")
    try:
        state_f = make_state(pos_f, vel_f, masses, scale_factor=a_f)
        kap = convergence_map_from_state(
            state_f, params, box, ng=256 if not small else 96,
            n_planes=16 if not small else 8, z_source=1.0)
        kap = np.asarray(kap)
        krms = float(np.std(kap))
        check("lensing_map_finite", krms,
              np.all(np.isfinite(kap)) and 1e-4 < krms < 1.0,
              "finite, rms in (1e-4, 1)")
    except Exception as exc:  # noqa: BLE001 -- record, don't lose cert
        log(f"  lensing stage failed: {exc!r}")
        check("lensing_stage_ok", repr(exc)[:300], False, "no exception")

    t_analysis = time.perf_counter() - t_an0
    wall = rec["t_ic"] + rec["t_evolve"] + t_analysis
    passed = all(c["pass"] for c in checks.values()
                 if c["pass"] is not None)
    cert = {
        "kind": "lambda_cdm_tpu science certificate",
        "passed": passed,
        "config": {"n_particles": n, "box_Mpc_h": box,
                   "pm_grid": g["pm_grid"],
                   "softening": g["softening"],
                   "z_init": Z_INIT, "solver": "treepm_fast",
                   "kick_mode": "comoving", "small": small,
                   "z_final_override": z_final if z_final > 0 else None},
        "platform": rec["platform"],
        "steps": steps,
        "wall_clock_s": round(wall, 1),
        "evolve_s": round(rec["t_evolve"], 1),
        "ic_s": round(rec["t_ic"], 1),
        "ic_cached": rec["ic_cached"],
        "analysis_s": round(t_analysis, 1),
        "fof_s": round(t_fof, 1),
        "li_wall_s": rec.get("li_wall_s", 0.0),
        "ms_per_step_incl_analysis": round(1e3 * rec["t_evolve"]
                                           / max(steps, 1), 2),
        "a_final": a_f,
        "growth_factor_sq": growth,
        "pk_snapshots": len(rec["pk_snapshots"]),
        "pk_table": pk_table,
        "hmf": hmf,
        "engine_stats": rec.get("engine_stats", {}),
        "step_breakdown": rec.get("breakdown", {}),
        "layzer_irvine_samples": rec["li_samples"],
        "checks": checks,
        "measured_at": __import__("datetime").datetime.now(
            __import__("datetime").timezone.utc).isoformat(
                timespec="seconds"),
    }
    return cert


def main():
    small = "--small" in sys.argv
    analyze_only = "--analyze-only" in sys.argv
    # the flagship 1M certificate owns SCIENCE.json; the small-geometry
    # certificate lands beside it
    suffix = "_small" if small else ""
    out_path = os.path.join(ROOT, f"SCIENCE{suffix}.json")
    record_path = os.path.join(ROOT, f"science_record{suffix}.npz")
    if analyze_only:
        # the evolve phase configures the package logger through the
        # engine; analyze-only has no engine, so INFO diagnostics from
        # the analysis stack (find_halos stage markers) would vanish
        import logging
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(levelname)s "
                                   "%(name)s: %(message)s",
                            stream=sys.stderr)
        # optional explicit path: --analyze-only <file.npz>
        idx = sys.argv.index("--analyze-only")
        if idx + 1 < len(sys.argv) and sys.argv[idx + 1].endswith(".npz"):
            record_path = sys.argv[idx + 1]
        log(f"analyze-only: loading {record_path}")
        rec = load_record(record_path)
    else:
        rec = evolve_phase(small, record_path)
    cert = analyze_phase(rec)
    with open(out_path, "w") as f:
        json.dump(cert, f, indent=1)
    log(f"wrote {out_path}")
    print(json.dumps({"passed": cert["passed"],
                      "steps": cert["steps"],
                      "wall_clock_s": cert["wall_clock_s"],
                      "checks_failed": [k for k, v in cert["checks"].items()
                                        if v["pass"] is False],
                      "checks_skipped": [k for k, v in
                                         cert["checks"].items()
                                         if v["pass"] is None]}))
    sys.exit(0 if cert["passed"] else 1)


if __name__ == "__main__":
    main()
