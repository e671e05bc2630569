"""Linear-growth validation: evolved P(k) amplitude tracks D(a)^2.

The canonical N-body correctness check the reference never had: start
from Zel'dovich ICs deep in the linear regime, advance with the
PRODUCTION treepm_fast stepper, and require the large-scale power to
grow by (D(a1)/D(a0))^2. The ratio is taken on the same realization,
so cosmic variance cancels mode by mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis.power_spectrum import measure_power_spectrum
from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.physics.cosmology import growth_factor


def _growth_config(kick_mode: str):
    ngrid, box = 24, 150.0
    cfg = SimulationConfig()
    cfg.particles.num_particles = ngrid ** 3
    cfg.particles.box_size = box
    ic = cfg.particles.initial_conditions
    ic.type = "zeldovich"            # 1LPT: strictly linear displacement
    ic.grid_size = ngrid
    ic.random_seed = 11
    cfg.forces.type = "treepm_fast"
    cfg.forces.pm_grid_size = 48
    cfg.forces.softening_length = 0.5
    cfg.forces.rebucket_every = 8
    cfg.cosmology.initial_redshift = 49.0
    cfg.cosmology.final_redshift = 24.0         # a: 0.02 -> 0.04
    cfg.time.initial_timestep = 1e-4
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.02
    cfg.simulation.output_frequency = 8
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    cfg.integration.kick_mode = kick_mode
    return cfg, ngrid, box


def _measured_growth(kick_mode: str):
    cfg, ngrid, box = _growth_config(kick_mode)
    eng = SimulationEngine(cfg)
    eng.initialize()
    a0 = float(eng.state.scale_factor)
    # grid-based Zel'dovich loads carry no Poisson shot noise below the
    # particle Nyquist; subtracting V/N (= 244 here) would swamp the
    # tiny z=49 linear power
    p0 = measure_power_spectrum(eng.state.positions, box, 32,
                                weights=eng.state.masses,
                                subtract_shot_noise=False)
    eng.run(num_steps=4000)          # runs until final_redshift
    a1 = float(eng.state.scale_factor)
    assert a1 > 1.9 * a0, f"run stopped early: a {a0} -> {a1}"
    p1 = measure_power_spectrum(eng.state.positions, box, 32,
                                weights=eng.state.masses,
                                subtract_shot_noise=False)

    params = cfg.cosmology_params()
    d_ratio = float(growth_factor(params, jnp.asarray(a1))
                    / growth_factor(params, jnp.asarray(a0)))
    want = d_ratio ** 2

    # large scales only: k below ~ a third of the particle Nyquist
    k = np.asarray(p0.k)
    k_ny = np.pi * ngrid / box
    sel = (k > 0) & (k < k_ny / 3.0) & (np.asarray(p0.power) > 0)
    assert sel.sum() >= 4
    got = np.asarray(p1.power)[sel] / np.asarray(p0.power)[sel]

    return float(np.mean(got)), want, d_ratio, a0, a1


@pytest.mark.slow
def test_linear_growth_comoving():
    """kick_mode="comoving" (canonical-momentum KDK, the production
    cosmology convention) reproduces linear-theory growth."""
    ratio, want, d_ratio, a0, a1 = _measured_growth("comoving")
    assert abs(ratio / want - 1.0) < 0.10, \
        f"P(k) grew x{ratio:.3f}, linear theory {want:.3f} " \
        f"(D ratio {d_ratio:.3f}, a {a0:.4f}->{a1:.4f})"


@pytest.mark.slow
def test_linear_growth_reference_parity_overshoots():
    """kick_mode="reference" (the reference's 1/a^2 kick with no Hubble
    drag, lambda_cdm_kernels.cu:310-318) is NOT true comoving dynamics:
    it systematically over-grows structure (~12% in D over one a-octave
    here). Pinned as a characterization test so the deviation is a
    documented parity property, not a silent surprise."""
    ratio, want, _, _, _ = _measured_growth("reference")
    excess = ratio / want
    assert 1.05 < excess < 1.6, \
        f"reference-mode growth excess drifted: x{excess:.3f}"
