"""End-to-end science validation #2: evolve a box from z=19 to z=0.5
and compare the FoF halo mass function against Sheth-Tormen theory
(ST is z-parameterized, so any epoch closes the loop; stopping at
z=0.5 keeps the late-time clustering era -- where the global bucket
capacity and the acceleration-limited adaptive dt make CPU steps
expensive -- inside the slow-tier budget; a z=0 probe run of the same
config took ~2 h on one core).

Closes the ICs -> solver -> halo-analysis loop the same way
test_science_pk.py closes the P(k) loop (the reference declares the
theory functions in halo_finder.hpp:118-124 and a find_halos pipeline
in halo_finder.cpp:15-45 but never composes them into a validation).

Expectations are physical, not tuned: FoF(b=0.2) abundances track ST
within tens of percent for well-resolved halos in large simulations;
in a 48^3-particle, 75 Mpc/h box with a PM-limited force resolution the
honest bar is per-bin agreement within a factor ~2.5 plus Poisson
scatter, and a band-averaged (geometric-mean) ratio within ~1.7x.
A catastrophic failure mode this guards: over-merging (one giant
percolated halo), under-collapse (no halos above 32 particles), or a
mass function off by an order of magnitude.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis import halo_finder
from lambda_cdm_tpu.analysis.theory import mass_function as st_mass_function
from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

pytestmark = pytest.mark.slow  # full z=19 -> 0 evolution, minutes


Z_FINAL = 0.5


def test_evolved_fof_mass_function_matches_sheth_tormen():
    params = CosmologyParams()
    # 40^3 at the headline density: small enough for the CPU slow tier
    # (the first cut, 48^3 with softening 0.1, ran >2 h on one core --
    # the adaptive dt limiter is eta*sqrt(eps/|a|_max), so a tight
    # softening stalls the late-time steps inside collapsed halos)
    n_side, ng_ic, box = 40, 40, 62.5
    a_i = 0.05
    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(7), params, ng=ng_ic, n_side=n_side,
        box_size=box, a_init=a_i, kick_mode="comoving")
    n = pos.shape[0]
    m_p = 27.7536 * params.omega_m * box ** 3 / n   # [1e10 Msun/h]
    mass = jnp.full((n,), m_p)

    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.forces.type = "treepm_fast"
    cfg.forces.softening_length = 0.3
    cfg.forces.rebucket_every = 4
    cfg.time.initial_timestep = 1e-4
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 1.0 / a_i - 1.0
    cfg.cosmology.final_redshift = Z_FINAL
    cfg.integration.kick_mode = "comoving"
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.05
    cfg.simulation.output_frequency = 16
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=a_i))
    eng.run(num_steps=100_000)     # final_redshift stops it
    a_f = float(eng.state.scale_factor)
    assert a_f >= 0.95 / (1.0 + Z_FINAL), f"run stopped early at a={a_f}"
    z_f = 1.0 / a_f - 1.0

    live = eng.state.masses > 0
    assert int(jnp.sum(live)) == n
    cat = halo_finder.find_halos(
        eng.state.positions, eng.state.velocities, eng.state.masses,
        box, min_particles=20, max_halos=1024)
    n_h = int(cat.num_halos)
    # structure formed, and the catalog capacity was not saturated
    # (saturation would silently truncate the low-mass bins)
    assert 10 <= n_h < 1024, f"num_halos={n_h}"
    # no percolation catastrophe: the largest halo holds a small
    # fraction of the box
    assert int(jnp.max(cat.n_particles)) < 0.2 * n

    # measured dn/dlog10(M) over halos resolved by >= 32 particles
    m_lo = 32.0 * m_p
    m_hi = float(jnp.max(cat.mass)) * (1 + 1e-5)
    assert m_hi > m_lo, "no halos above the 32-particle floor"
    centers, dn_dlog10, counts = halo_finder.mass_function(
        cat, box, num_bins=5, m_min=m_lo, m_max=m_hi)
    centers = np.asarray(centers)
    measured = np.asarray(dn_dlog10)
    counts = np.asarray(counts)

    theory = np.asarray(st_mass_function(params, jnp.asarray(centers),
                                         z=z_f)) * math.log(10.0)

    # compare bins with enough halos for the Poisson error to be small
    ok = counts >= 8
    assert ok.sum() >= 2, f"too few populated bins: counts={counts}"
    ratio = measured[ok] / theory[ok]
    # per-bin factor-2.5 + 3 sigma Poisson; band geometric mean 1.7x
    sigma = 1.0 / np.sqrt(counts[ok])
    lo = 1.0 / 2.5 / (1.0 + 3.0 * sigma)
    hi = 2.5 * (1.0 + 3.0 * sigma)
    assert np.all((ratio > lo) & (ratio < hi)), \
        f"HMF per-bin ratio off: M={centers[ok]}, ratio={ratio}"
    gmean = float(np.exp(np.mean(np.log(ratio))))
    assert 1.0 / 1.7 < gmean < 1.7, \
        f"HMF band ratio {gmean:.2f} (measured={measured[ok]}, " \
        f"theory={theory[ok]})"
