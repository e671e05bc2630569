"""Analytic halo/LSS theory: mass functions, bias, NFW profiles, HOD.

The reference *declares* this entire module and never implements it
(halo_utils: NFW fitting, Sheth-Tormen/Press-Schechter mass functions,
linear bias, HOD occupation -- include/analysis/halo_finder.hpp:108-142,
zero implementation). Here it is for real, in pure JAX, built on the
sigma(R) machinery of physics.power_spectra.

Conventions: M in 1e10 Msun/h, R in Mpc/h, number densities in (Mpc/h)^-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..physics.cosmology import CosmologyParams, growth_factor
from ..physics.power_spectra import sigma_r, eh98_transfer

DELTA_C = 1.686          # spherical-collapse threshold
RHO_CRIT = 27.753662724570805   # (1e10 Msun/h) / (Mpc/h)^3


def mass_to_radius(params: CosmologyParams, m):
    """Lagrangian top-hat radius R(M) with rho_bar = rho_crit Omega_m."""
    rho_bar = RHO_CRIT * params.omega_m
    return (3.0 * jnp.asarray(m) / (4.0 * jnp.pi * rho_bar)) ** (1.0 / 3.0)


def sigma_m(params: CosmologyParams, m, z=0.0, transfer=eh98_transfer):
    """sigma(M, z)."""
    r = mass_to_radius(params, m)
    d = growth_factor(params, 1.0 / (1.0 + z))
    return sigma_r(params, r, transfer=transfer) * d


def _dlnsigma_dlnm(params: CosmologyParams, m, z):
    lnm = jnp.log(jnp.asarray(m))
    eps = 0.05
    s_hi = jnp.log(sigma_m(params, jnp.exp(lnm + eps), z))
    s_lo = jnp.log(sigma_m(params, jnp.exp(lnm - eps), z))
    return (s_hi - s_lo) / (2.0 * eps)


def press_schechter_multiplicity(nu):
    """f_PS(nu) = sqrt(2/pi) nu exp(-nu^2/2)."""
    return jnp.sqrt(2.0 / jnp.pi) * nu * jnp.exp(-0.5 * nu * nu)


def sheth_tormen_multiplicity(nu, a=0.707, p=0.3, big_a=0.3222):
    """f_ST(nu) (Sheth & Tormen 1999)."""
    anu2 = a * nu * nu
    return (big_a * jnp.sqrt(2.0 * a / jnp.pi) * nu
            * (1.0 + anu2 ** -p) * jnp.exp(-0.5 * anu2))


def mass_function(params: CosmologyParams, m, z=0.0, kind="sheth_tormen"):
    """dn/dlnM [(Mpc/h)^-3] (declared: halo_finder.hpp:118-124)."""
    m = jnp.asarray(m)
    sig = sigma_m(params, m, z)
    nu = DELTA_C / sig
    f = (sheth_tormen_multiplicity(nu) if kind.startswith("sheth")
         else press_schechter_multiplicity(nu))
    rho_bar = RHO_CRIT * params.omega_m
    dlns = jnp.abs(_dlnsigma_dlnm(params, m, z))
    return rho_bar / m * f * dlns


def linear_bias(params: CosmologyParams, m, z=0.0, a=0.707, p=0.3):
    """Sheth-Tormen peak-background-split linear halo bias
    (declared: halo_finder.hpp:126-129)."""
    nu = DELTA_C / sigma_m(params, m, z)
    anu2 = a * nu * nu
    return (1.0 + (anu2 - 1.0) / DELTA_C
            + 2.0 * p / (DELTA_C * (1.0 + anu2 ** p)))


# ---------------------------------------------------------------------------
# NFW profiles
# ---------------------------------------------------------------------------

def nfw_density(r, rho_s, r_s):
    """rho(r) = rho_s / [(r/rs)(1 + r/rs)^2] (declared:
    halo_finder.hpp:108-111)."""
    x = jnp.asarray(r) / r_s
    return rho_s / (x * (1.0 + x) ** 2)


def nfw_enclosed_mass(r, rho_s, r_s):
    """M(<r) = 4 pi rho_s rs^3 [ln(1+x) - x/(1+x)]."""
    x = jnp.asarray(r) / r_s
    return 4.0 * jnp.pi * rho_s * r_s ** 3 * (jnp.log(1.0 + x)
                                              - x / (1.0 + x))


def nfw_params_from_m_c(m_delta, r_delta, c):
    """(rho_s, r_s) for a halo of mass M within R at concentration c."""
    r_s = r_delta / c
    mu = jnp.log(1.0 + c) - c / (1.0 + c)
    rho_s = m_delta / (4.0 * jnp.pi * r_s ** 3 * mu)
    return rho_s, r_s


def concentration_duffy08(m, z=0.0):
    """Duffy et al. 2008 c(M, z) relation (M in 1e10 Msun/h)."""
    m_pivot = 2e2   # 2e12 Msun/h in 1e10 units
    return 5.71 * (jnp.asarray(m) / m_pivot) ** -0.084 * (1.0 + z) ** -0.47


def fit_nfw_concentration(r, m_enclosed, r_delta, m_delta,
                          c_grid=None):
    """Fit c by least squares of log M(<r) against NFW on a c-grid
    (the declared fit_nfw_profile capability, halo_finder.hpp:108-111;
    grid search keeps it jit-friendly)."""
    if c_grid is None:
        c_grid = jnp.linspace(2.0, 25.0, 93)

    def loss(c):
        rho_s, r_s = nfw_params_from_m_c(m_delta, r_delta, c)
        pred = nfw_enclosed_mass(r, rho_s, r_s)
        w = (r > 0.05 * r_delta) & (r <= r_delta) & (m_enclosed > 0)
        d = jnp.log(jnp.maximum(pred, 1e-20)) \
            - jnp.log(jnp.maximum(m_enclosed, 1e-20))
        return jnp.sum(jnp.where(w, d * d, 0.0))

    losses = jax.vmap(loss)(c_grid)
    return c_grid[jnp.argmin(losses)]


# ---------------------------------------------------------------------------
# HOD (Zheng et al. 2005 five-parameter form)
# ---------------------------------------------------------------------------

def hod_central(m, log_m_min=11.0 - 10.0, sigma_logm=0.2):
    """<N_cen>(M) = 1/2 [1 + erf((log M - log M_min)/sigma)]
    (declared: halo_finder.hpp:131-134). M in 1e10 Msun/h, so the default
    log M_min = 11 (Msun/h) becomes 1.0 here."""
    logm = jnp.log10(jnp.asarray(m))
    return 0.5 * (1.0 + jax.lax.erf((logm - log_m_min)
                                    / (jnp.sqrt(2.0) * sigma_logm)))


def hod_satellites(m, log_m0=1.0, log_m1=2.0, alpha=1.0,
                   log_m_min=1.0, sigma_logm=0.2):
    """<N_sat>(M) = <N_cen> ((M - M0)/M1)^alpha for M > M0."""
    m = jnp.asarray(m)
    m0, m1 = 10.0 ** log_m0, 10.0 ** log_m1
    ncen = hod_central(m, log_m_min, sigma_logm)
    frac = jnp.maximum(m - m0, 0.0) / m1
    return ncen * frac ** alpha


def galaxy_number_density(params: CosmologyParams, z=0.0, *,
                          hod_kwargs=None, m_grid=None):
    """n_gal = ∫ dn/dlnM (<N_cen> + <N_sat>) dlnM."""
    hod_kwargs = hod_kwargs or {}
    if m_grid is None:
        m_grid = jnp.logspace(0.0, 5.0, 128)   # 1e10..1e15 Msun/h
    dndlnm = mass_function(params, m_grid, z)
    occ = hod_central(m_grid, **{k: v for k, v in hod_kwargs.items()
                                 if k in ("log_m_min", "sigma_logm")}) \
        + hod_satellites(m_grid, **hod_kwargs)
    lnm = jnp.log(m_grid)
    return jnp.trapezoid(dndlnm * occ, lnm)
