"""Certified solver-attribution probe (VERDICT r4 item 7).

benchmarks/probe_pk_direct.py is the measurement that CALIBRATED the
flagship science bars: same-ICs z=24 -> 0 evolutions under treepm_fast
vs the min-image direct solver showed (on-chip, 64k) that

  * the box-scale fundamental mode grows CORRECTLY under treepm_fast
    (0.97x the ODE growth^2 — the PM FFT is exactly periodic), while
  * the min-image direct solver OVER-grows it 2.4x (min-image is not
    periodic gravity; the Ewald oracle in forces/ewald.py quantifies
    the same systematic at force level),

which is why the science certificate's strict growth bars are keyed to
treepm_fast and the z=0 window carries a measured quasi-linear
envelope. This test pins those two facts at a CPU-affordable geometry
(16^3 particles, same pipeline through the SimulationEngine) so the
bar calibration cannot silently rot. Slow tier (~2-4 min on CPU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

BOX = 60.0
N_SIDE = 16
A_I = 1.0 / 25.0


def _evolve(solver, pos, vel, mass):
    from lambda_cdm_tpu.core.config import SimulationConfig
    from lambda_cdm_tpu.core.engine import SimulationEngine
    from lambda_cdm_tpu.core.state import make_state
    cfg = SimulationConfig()
    cfg.particles.num_particles = pos.shape[0]
    cfg.particles.box_size = BOX
    cfg.forces.type = solver
    cfg.forces.softening_length = 0.5
    if solver == "treepm_fast":
        # explicit PM grid: at 16^3 particles the auto plan degenerates
        # to a single-cell short-range lattice (4096^2 x 27 pair slots
        # per step = minutes/step on a CPU core); 32^3 PM -> ncell 8
        cfg.forces.pm_grid_size = 32
        cfg.forces.bucket_capacity = 256
        cfg.forces.rebucket_every = 16
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 1.0 / A_I - 1.0
    cfg.cosmology.final_redshift = 0.0
    cfg.integration.kick_mode = "comoving"
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.03
    cfg.integration.min_timestep = 1e-9
    cfg.integration.max_timestep = 1e-3
    cfg.simulation.output_frequency = 50
    cfg.io.snapshots.enabled = False
    cfg.profiling.output_file = ""
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=A_I))
    eng.run(num_steps=1_000_000)
    a_f = float(eng.state.scale_factor)
    assert a_f >= 0.98, f"{solver} stopped early at a={a_f}"
    pos_f = eng.state.positions
    eng.release_force_state()
    return pos_f, a_f


def test_fundamental_mode_solver_attribution():
    from lambda_cdm_tpu.analysis.power_spectrum import \
        measure_power_spectrum
    from lambda_cdm_tpu.physics import initial_conditions as ics
    from lambda_cdm_tpu.physics.cosmology import (CosmologyParams,
                                                  growth_factor_exact)
    params = CosmologyParams()
    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(2026), params, ng=32, n_side=N_SIDE,
        box_size=BOX, a_init=A_I, kick_mode="comoving")
    n = pos.shape[0]
    mass = jnp.full((n,), 27.7536 * params.omega_m * BOX ** 3 / n,
                    jnp.float32)
    pk_i = measure_power_spectrum(pos, BOX, ng=32, num_bins=12,
                                  subtract_shot_noise=False)
    k = np.asarray(pk_i.k)
    p_i = np.asarray(pk_i.power)
    # fundamental bin: the smallest nonzero-k populated bin
    counts = np.asarray(pk_i.counts)
    fund = int(np.nonzero((k > 0) & (counts > 0) & (p_i > 0))[0][0])

    out = {}
    for solver in ("treepm_fast", "direct"):
        pos_f, a_f = _evolve(solver, pos, vel, mass)
        pk_f = measure_power_spectrum(pos_f, BOX, ng=32, num_bins=12,
                                      subtract_shot_noise=False)
        growth = (float(growth_factor_exact(params, a_f))
                  / float(growth_factor_exact(params, A_I))) ** 2
        out[solver] = float(np.asarray(pk_f.power)[fund]
                            / max(p_i[fund], 1e-30) / growth)

    # (i) treepm_fast grows the box-scale mode at the ODE rate (the
    #     exactly-periodic PM handles k_fundamental): measured 0.97 at
    #     64k on-chip (benchmarks/probe_pk_direct_result.json)
    assert 0.6 < out["treepm_fast"] < 1.5, out
    # (ii) the min-image direct solver OVER-grows it (the systematic
    #      that disqualifies min-image as a large-scale oracle):
    #      measured 2.39x at 64k on-chip and ~7x at this 16^3 CPU
    #      geometry — always far above treepm's
    assert out["direct"] > 1.5, out
    assert out["direct"] > 1.3 * out["treepm_fast"], out
