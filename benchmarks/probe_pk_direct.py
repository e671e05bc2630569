#!/usr/bin/env python
"""Attribute the flagship's linear-window P(k) growth deficit.

The first full 1M z=0 on-chip run measured the evolved/initial power
ratio at k < 0.15 h/Mpc running -12.6% (mean) below the ODE-exact
growth^2, with -32% in the worst bin; the small 62.5 Mpc/h box shows
-17% at k < 0.25.  Three candidate causes with different fixes:

  (a) treepm_fast loses large-scale force (PM split / deposit bug)
      -> compare against the DIRECT pairwise solver on the SAME ICs:
         per-bin final power ratio fast/direct isolates the solver
         from physics and realization, since both runs share modes;
  (b) integration error at the production max_dloga
      -> rerun at half max_dloga (env LCDM_PROBE_DLOGA) and compare;
  (c) genuine quasi-linear + finite-box physics
      -> both solvers show the same deficit and it is dt-converged.

Runs the science_run --small geometry (40^3, 62.5 Mpc/h, z=24 -> 0)
through the SimulationEngine on whatever backend jax selects (TPU in
production).  Prints a per-bin table and one JSON line.

Usage:  python benchmarks/probe_pk_direct.py [--fast-only|--direct-only]
        LCDM_PROBE_DLOGA=0.015 python benchmarks/probe_pk_direct.py
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

from lambda_cdm_tpu.analysis.power_spectrum import measure_power_spectrum
from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import (CosmologyParams,
                                              growth_factor_exact)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def evolve(solver: str, pos, vel, mass, box, a_i, max_dloga: float):
    cfg = SimulationConfig()
    n = pos.shape[0]
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.forces.type = solver
    cfg.forces.softening_length = 0.3
    if solver == "treepm_fast":
        cfg.forces.bucket_capacity = 2048
        cfg.forces.rebucket_every = 16
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 1.0 / a_i - 1.0
    cfg.cosmology.final_redshift = 0.0
    cfg.integration.kick_mode = "comoving"
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = max_dloga
    cfg.integration.min_timestep = 1e-9
    cfg.integration.max_timestep = 1e-3
    cfg.simulation.output_frequency = 50
    cfg.simulation.checkpoint_frequency = 0
    cfg.io.snapshots.enabled = False
    cfg.profiling.output_file = ""
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=a_i))
    t0 = time.perf_counter()
    eng.run(num_steps=1_000_000)
    wall = time.perf_counter() - t0
    a_f = float(eng.state.scale_factor)
    steps = int(eng.statistics.total_steps)
    log(f"  {solver}: a_f={a_f:.4f} in {steps} steps, {wall:.1f} s")
    assert a_f >= 0.98, f"{solver} stopped early at a={a_f}"
    live = eng.state.masses > 0
    assert int(jnp.sum(live)) == n, "particles lost"
    pos_f = eng.state.positions
    eng.release_force_state()
    return pos_f, a_f


def main():
    params = CosmologyParams()
    n_side, ng_ic, box = 40, 80, 62.5
    a_i = 1.0 / 25.0
    max_dloga = float(os.environ.get("LCDM_PROBE_DLOGA", "0.03"))
    pk_grid, nbins = 64, 24

    log(f"[probe] backend={jax.default_backend()} max_dloga={max_dloga}")
    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(2026), params, ng=ng_ic, n_side=n_side,
        box_size=box, a_init=a_i, kick_mode="comoving")
    n = pos.shape[0]
    mass = jnp.full((n,), 27.7536 * params.omega_m * box ** 3 / n,
                    jnp.float32)
    pk_i = measure_power_spectrum(pos, box, ng=pk_grid, num_bins=nbins,
                                  subtract_shot_noise=False)
    k = np.asarray(pk_i.k)
    p_i = np.asarray(pk_i.power)

    out = {"max_dloga": max_dloga, "backend": jax.default_backend(),
           "k": [round(float(x), 4) for x in k]}
    results = {}
    for solver in ("treepm_fast", "direct"):
        if f"--{'direct' if solver == 'treepm_fast' else 'fast'}-only" \
                in sys.argv:
            continue
        log(f"[probe] evolving with {solver}")
        pos_f, a_f = evolve(solver, pos, vel, mass, box, a_i, max_dloga)
        pk_f = measure_power_spectrum(pos_f, box, ng=pk_grid,
                                      num_bins=nbins,
                                      subtract_shot_noise=False)
        growth = (float(growth_factor_exact(params, a_f))
                  / float(growth_factor_exact(params, a_i))) ** 2
        ratio = np.asarray(pk_f.power) / np.maximum(p_i, 1e-30) / growth
        results[solver] = (np.asarray(pk_f.power), ratio)
        out[solver] = {"a_f": a_f,
                       "ratio_over_growth":
                           [round(float(x), 4) for x in ratio]}

    hdr = f"{'k':>8}"
    cols = [f"{x:8.4f}" for x in k]
    lines = []
    for name, (_, ratio) in results.items():
        lines.append((name, [f"{x:8.4f}" for x in ratio]))
    if len(results) == 2:
        pf = results["treepm_fast"][0] / np.maximum(
            results["direct"][0], 1e-30)
        out["fast_over_direct_power"] = [round(float(x), 4) for x in pf]
        lines.append(("fast/direct", [f"{x:8.4f}" for x in pf]))
    log(hdr + "  " + "  ".join(cols[:12]))
    for name, vals in lines:
        log(f"{name:>12}  " + "  ".join(vals[:12]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
