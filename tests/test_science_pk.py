"""End-to-end science validation: evolve a box from z=49 to z=0 through
the production stepper and compare the measured P(k) against linear
theory on large scales (VERDICT round-2 item 7 -- the loop the
reference's power_spectrum.cu + cuda_nbody_test gesture at but never
compose: ICs -> solver -> analysis).

Per-mode strategy: the evolved/initial power RATIO cancels the
realization's sample variance, so linear-scale growth must match
(D(1)/D(a_i))^2 tightly even in a small box; small scales must show
the (mild, resolution-limited) nonlinear excess without collapsing
(PM over-damping) or exploding (integration error).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis.power_spectrum import measure_power_spectrum
from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import (CosmologyParams,
                                              growth_factor_exact)

pytestmark = pytest.mark.slow  # full z=49 -> 0 evolution, minutes


def test_evolved_pk_matches_linear_growth_on_large_scales():
    params = CosmologyParams()
    n_side, ng_ic, box = 32, 32, 128.0
    a_i = 0.02
    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(11), params, ng=ng_ic, n_side=n_side,
        box_size=box, a_init=a_i, kick_mode="comoving")
    n = pos.shape[0]
    mass = jnp.full((n,), 27.7536 * params.omega_m * box ** 3 / n)

    pk_i = measure_power_spectrum(pos, box, ng=64, num_bins=24)

    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.forces.type = "treepm_fast"
    cfg.forces.softening_length = 0.2
    cfg.forces.rebucket_every = 4
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 1.0 / a_i - 1.0
    cfg.cosmology.final_redshift = 0.0
    cfg.integration.kick_mode = "comoving"
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.03
    cfg.simulation.output_frequency = 16
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=a_i))
    eng.run(num_steps=100_000)     # final_redshift stops it
    a_f = float(eng.state.scale_factor)
    assert a_f >= 0.98, f"run stopped early at a={a_f}"

    live = eng.state.masses > 0
    pos_f = eng.state.positions[live]
    assert int(jnp.sum(live)) == n
    pk_f = measure_power_spectrum(pos_f, box, ng=64, num_bins=24)

    k = np.asarray(pk_i.k)
    ratio = np.asarray(pk_f.power) / np.maximum(np.asarray(pk_i.power),
                                                1e-30)
    growth = (float(growth_factor_exact(params, a_f))
              / float(growth_factor_exact(params, a_i))) ** 2

    # large scales (k < 0.15 h/Mpc): per-mode growth ratio cancels
    # sample variance; allow integration + small-box coupling slack
    lin = (k > 0) & (k < 0.15) & np.isfinite(ratio)
    assert lin.sum() >= 3, f"too few linear bins: {k}"
    rel = ratio[lin] / growth - 1.0
    assert np.all(np.abs(rel) < 0.25), \
        f"linear-scale growth off: k={k[lin]}, rel={rel}"
    # and the band-average must be much tighter than per-bin slack
    assert abs(float(np.mean(rel))) < 0.10, \
        f"mean linear-scale growth bias {np.mean(rel):+.3f}"

    # small scales (0.3 < k < 0.7): mild nonlinear excess expected --
    # above ~0.9x linear growth (no PM over-damping) and below the
    # regime of runaway integration error
    nl = (k > 0.3) & (k < 0.7) & np.isfinite(ratio)
    assert nl.sum() >= 3
    nl_ratio = float(np.mean(ratio[nl])) / growth
    assert 0.9 < nl_ratio < 5.0, f"small-scale ratio/linear {nl_ratio}"
    # documented expectation: net nonlinear EXCESS on the band average
    assert nl_ratio > 1.0, \
        f"no nonlinear excess at k in (0.3, 0.7): {nl_ratio}"
