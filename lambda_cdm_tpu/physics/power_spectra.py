"""Linear matter power spectra: BBKS and Eisenstein-Hu transfer functions,
sigma(R), and sigma8 normalization -- pure JAX.

TPU-native rebuild of the reference's power-spectrum machinery
(reference: src/physics/initial_conditions.cpp:36-171 for the tabulated
P(k) + sigma8 normalization, src/analysis/power_spectrum.cu:425-489 for the
EH98 transfer fit, src/physics/cosmology_model.cpp:96-143 for BBKS + sigma(R)).

Unlike the reference (which tabulates P(k) into 1000 log bins and leaves the
BBKS normalization as a TODO, cosmology_model.cpp:114-116), these are closed
-form jnp functions, properly sigma8-normalized, evaluated directly at the
requested k -- no table, no interpolation error, fully differentiable.

Conventions: k in h/Mpc, P(k) in (Mpc/h)^3, R in Mpc/h.
EH98 internal scales are in 1/Mpc and converted at the boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cosmology import CosmologyParams, growth_factor, _GL_X, _GL_W

__all__ = [
    "bbks_transfer", "eh98_transfer", "eh98_nowiggle_transfer",
    "sigma_r", "sigma8_normalization", "linear_power", "TRANSFERS",
]


# ---------------------------------------------------------------------------
# Transfer functions
# ---------------------------------------------------------------------------

def bbks_transfer(params: CosmologyParams, k):
    """BBKS (Bardeen et al. 1986) CDM transfer function with the Sugiyama
    (1995) baryon correction to the shape parameter.

    Reference uses the same fit (cosmology_model.cpp:96-117). k in h/Mpc.
    """
    k = jnp.asarray(k)
    gamma = params.omega_m * params.h * jnp.exp(
        -params.omega_b * (1.0 + jnp.sqrt(2.0 * params.h) / params.omega_m))
    q = k * params.h / gamma / params.h  # = k / (Gamma) with k in h/Mpc
    q = jnp.maximum(q, 1e-12)
    ln_term = jnp.log(1.0 + 2.34 * q) / (2.34 * q)
    poly = (1.0 + 3.89 * q + (16.1 * q) ** 2 + (5.46 * q) ** 3
            + (6.71 * q) ** 4)
    return ln_term * poly ** -0.25


def _t0_tilde(q, alpha_c, beta_c):
    """EH98 eq. 19-20: the pressureless CDM shape."""
    c = 14.2 / alpha_c + 386.0 / (1.0 + 69.9 * q ** 1.08)
    ln_term = jnp.log(jnp.e + 1.8 * beta_c * q)
    return ln_term / (ln_term + c * q * q)


def eh98_transfer(params: CosmologyParams, k):
    """Full Eisenstein & Hu (1998) transfer function with baryon acoustic
    oscillations (reference: theory::eisenstein_hu_transfer_function,
    power_spectrum.cu:425-489, which implements the same fit).

    k in h/Mpc; internally converted to 1/Mpc as EH98 requires.
    """
    k = jnp.maximum(jnp.asarray(k), 1e-12) * params.h  # -> 1/Mpc
    om = params.omega_m * params.h ** 2
    ob = params.omega_b * params.h ** 2
    oc_frac = (params.omega_m - params.omega_b) / params.omega_m
    ob_frac = params.omega_b / params.omega_m
    theta = params.t_cmb / 2.7

    # Matter-radiation equality (eq. 2-3)
    z_eq = 2.50e4 * om * theta ** -4
    k_eq = 7.46e-2 * om * theta ** -2

    # Drag epoch (eq. 4)
    b1 = 0.313 * om ** -0.419 * (1.0 + 0.607 * om ** 0.674)
    b2 = 0.238 * om ** 0.223
    z_d = (1291.0 * om ** 0.251 / (1.0 + 0.659 * om ** 0.828)
           * (1.0 + b1 * ob ** b2))

    # Baryon-photon momentum ratio (eq. 5)
    r_d = 31.5 * ob * theta ** -4 * (1e3 / z_d)
    r_eq = 31.5 * ob * theta ** -4 * (1e3 / z_eq)

    # Sound horizon (eq. 6)
    s = (2.0 / (3.0 * k_eq)) * jnp.sqrt(6.0 / r_eq) * jnp.log(
        (jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_d + r_eq))
        / (1.0 + jnp.sqrt(r_eq)))

    # Silk damping scale (eq. 7)
    k_silk = 1.6 * ob ** 0.52 * om ** 0.73 * (1.0 + (10.4 * om) ** -0.95)

    q = k / (13.41 * k_eq)  # eq. 10

    # CDM part (eq. 11-12, 17-18)
    a1 = (46.9 * om) ** 0.670 * (1.0 + (32.1 * om) ** -0.532)
    a2 = (12.0 * om) ** 0.424 * (1.0 + (45.0 * om) ** -0.582)
    alpha_c = a1 ** (-ob_frac) * a2 ** (-ob_frac ** 3)
    bb1 = 0.944 / (1.0 + (458.0 * om) ** -0.708)
    bb2 = (0.395 * om) ** -0.0266
    beta_c = 1.0 / (1.0 + bb1 * (oc_frac ** bb2 - 1.0))

    f = 1.0 / (1.0 + (k * s / 5.4) ** 4)
    t_c = (f * _t0_tilde(q, 1.0, beta_c)
           + (1.0 - f) * _t0_tilde(q, alpha_c, beta_c))

    # Baryon part (eq. 13-15, 21-24)
    y = (1.0 + z_eq) / (1.0 + z_d)
    sqrt_1py = jnp.sqrt(1.0 + y)
    g_y = y * (-6.0 * sqrt_1py + (2.0 + 3.0 * y)
               * jnp.log((sqrt_1py + 1.0) / (sqrt_1py - 1.0)))
    alpha_b = 2.07 * k_eq * s * (1.0 + r_d) ** -0.75 * g_y
    beta_b = (0.5 + ob_frac
              + (3.0 - 2.0 * ob_frac) * jnp.sqrt((17.2 * om) ** 2 + 1.0))
    beta_node = 8.41 * om ** 0.435
    s_tilde = s / (1.0 + (beta_node / (k * s)) ** 3) ** (1.0 / 3.0)
    ks_t = k * s_tilde
    sinc = jnp.sin(ks_t) / jnp.maximum(ks_t, 1e-12)
    t_b = (_t0_tilde(q, 1.0, 1.0) / (1.0 + (k * s / 5.2) ** 2)
           + alpha_b / (1.0 + (beta_b / (k * s)) ** 3)
           * jnp.exp(-(k / k_silk) ** 1.4)) * sinc

    return ob_frac * t_b + oc_frac * t_c


def eh98_nowiggle_transfer(params: CosmologyParams, k):
    """Eisenstein & Hu (1998) zero-baryon ('no-wiggle') shape fit
    (eq. 28-31): smooth BAO-free spectrum, useful for variance integrals
    and IC smoothing. k in h/Mpc."""
    k = jnp.maximum(jnp.asarray(k), 1e-12)
    om = params.omega_m * params.h ** 2
    ob = params.omega_b * params.h ** 2
    theta = params.t_cmb / 2.7
    ob_frac = params.omega_b / params.omega_m

    s = 44.5 * jnp.log(9.83 / om) / jnp.sqrt(1.0 + 10.0 * ob ** 0.75)
    alpha_g = (1.0 - 0.328 * jnp.log(431.0 * om) * ob_frac
               + 0.38 * jnp.log(22.3 * om) * ob_frac ** 2)
    gamma_eff = params.omega_m * params.h * (
        alpha_g + (1.0 - alpha_g) / (1.0 + (0.43 * k * params.h * s) ** 4))
    q = k * theta ** 2 / gamma_eff
    l0 = jnp.log(2.0 * jnp.e + 1.8 * q)
    c0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
    return l0 / (l0 + c0 * q * q)


TRANSFERS = {
    "bbks": bbks_transfer,
    "eisenstein_hu": eh98_transfer,
    "eh98": eh98_transfer,
    "eh98_nowiggle": eh98_nowiggle_transfer,
}


# ---------------------------------------------------------------------------
# sigma(R) and normalization
# ---------------------------------------------------------------------------

def _tophat_window(x):
    """Fourier transform of a real-space spherical top-hat (reference:
    theory::window_function_tophat, power_spectrum.cu:402-405)."""
    x = jnp.maximum(x, 1e-8)
    # use the series-stable form near x=0
    w = 3.0 * (jnp.sin(x) - x * jnp.cos(x)) / x ** 3
    return jnp.where(x < 1e-3, 1.0 - x * x / 10.0, w)


def _sigma2_unnormalized(params: CosmologyParams, r, transfer):
    """Variance integral with unit amplitude: (1/2pi^2) ∫ k^2 k^ns T^2 W^2 dk,
    Gauss-Legendre in ln k (reference: compute_sigma8's trapezoid loop,
    initial_conditions.cpp:131-171 / cosmology_model.cpp:120-143)."""
    ln_lo, ln_hi = jnp.log(1e-5), jnp.log(1e3)
    mid = 0.5 * (ln_hi + ln_lo)
    half = 0.5 * (ln_hi - ln_lo)
    lnk = mid + half * _GL_X
    k = jnp.exp(lnk)
    t = transfer(params, k)
    integrand = k ** (3.0 + params.n_s) * t * t * _tophat_window(k * r) ** 2
    return half * jnp.sum(_GL_W * integrand) / (2.0 * jnp.pi ** 2)


def sigma8_normalization(params: CosmologyParams, transfer=eh98_transfer):
    """Amplitude A such that sigma(R=8 Mpc/h) = params.sigma8 with
    P(k) = A k^ns T(k)^2."""
    return params.sigma8 ** 2 / _sigma2_unnormalized(params, 8.0, transfer)


def sigma_r(params: CosmologyParams, r, transfer=eh98_transfer):
    """RMS linear density fluctuation in top-hat spheres of radius R [Mpc/h]
    at z=0 (reference: compute_sigma, cosmology_model.cpp:120-143)."""
    amp = sigma8_normalization(params, transfer)
    r = jnp.atleast_1d(jnp.asarray(r))
    s2 = jax.vmap(lambda ri: _sigma2_unnormalized(params, ri, transfer))(r)
    out = jnp.sqrt(amp * s2)
    return out if out.shape != (1,) else out[0]


def linear_power(params: CosmologyParams, k, z=0.0, transfer="eisenstein_hu"):
    """Linear matter power spectrum P(k, z) in (Mpc/h)^3, sigma8-normalized,
    scaled to redshift z with the linear growth factor
    (reference: CosmologyModel::power_spectrum, cosmology_model.cpp:96-117,
    whose normalization was left TODO -- fixed here).

    `transfer` is a name in TRANSFERS or a callable (params, k) -> T.
    """
    t_fn = TRANSFERS[transfer] if isinstance(transfer, str) else transfer
    k = jnp.asarray(k)
    amp = sigma8_normalization(params, t_fn)
    t = t_fn(params, k)
    d = growth_factor(params, 1.0 / (1.0 + z))
    return amp * k ** params.n_s * t * t * d * d
