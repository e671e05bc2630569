"""Lambda-CDM background cosmology, pure JAX.

TPU-native rebuild of the reference's ``CosmologyModel`` capability surface
(reference: include/physics/cosmology_model.hpp:11-172,
src/physics/cosmology_model.cpp:12-143): Friedmann E(a), Hubble function,
density parameters, linear growth factor/rate, comoving/angular-diameter/
luminosity distances (including curved cases), conformal and cosmic time,
and the age of the universe.

Everything here is a pure function of (CosmologyParams, a-or-z) built from
``jnp`` ops with static shapes, so it can live inside ``jit``/``lax.scan``
and be vmapped over arrays of scale factors. Integrals use fixed-order
Gauss-Legendre quadrature in log-space (jit-friendly; no adaptive control
flow).

Improvements over the reference (see SURVEY.md section 2.4):
  * optional radiation term and (w0, wa) dark-energy equation of state,
  * an ODE-exact growth factor (`growth_factor_exact`) alongside the
    Carroll-Press-Turner 1992 approximation the reference uses,
  * everything differentiable (jax.grad works through all of it).

Units: "h-units" throughout -- lengths in Mpc/h, H in km/s/Mpc,
k in h/Mpc, time from `cosmic_time` in Gyr.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# Speed of light [km/s]
C_KM_S = 299792.458
# 1/(km/s/Mpc) in Gyr: (Mpc in km) / (Gyr in s) = 977.79...
_H_INV_TO_GYR = 3.0856775814913673e19 / 3.1556952e16
# Newton's constant in (Mpc/h) (km/s)^2 / (1e10 Msun/h)
G_GADGET_MPC = 43.0071057317063


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CosmologyParams:
    """Cosmological parameters (reference: CosmologyParams,
    include/physics/cosmology_model.hpp:11-32; defaults match it).

    All fields are pytree leaves, so params can be traced/vmapped/grad'd.
    """

    omega_m: jax.Array | float = 0.31        # total matter (cdm + baryons)
    omega_lambda: jax.Array | float = 0.69   # dark energy
    omega_b: jax.Array | float = 0.049       # baryons (subset of omega_m)
    omega_k: jax.Array | float = 0.0         # curvature
    omega_r: jax.Array | float = 0.0         # radiation (reference: absent)
    h: jax.Array | float = 0.67              # H0 / (100 km/s/Mpc)
    sigma8: jax.Array | float = 0.81         # P(k) normalization at z=0
    n_s: jax.Array | float = 0.965           # scalar spectral index
    w0: jax.Array | float = -1.0             # DE equation of state today
    wa: jax.Array | float = 0.0              # DE EoS evolution (CPL)
    t_cmb: jax.Array | float = 2.7255        # CMB temperature [K]

    @property
    def h0(self):
        """H0 in km/s/Mpc."""
        return 100.0 * self.h

    def validate(self) -> None:
        """Host-side sanity check: flatness budget (reference:
        cosmology_model.hpp:23-31 validates sum(Omega)==1)."""
        total = float(self.omega_m) + float(self.omega_lambda) \
            + float(self.omega_k) + float(self.omega_r)
        if abs(total - 1.0) > 1e-4:
            raise ValueError(
                f"Omega_m+Omega_lambda+Omega_k+Omega_r = {total} != 1")
        if float(self.omega_b) > float(self.omega_m):
            raise ValueError("omega_b must be <= omega_m")
        if not (0.2 < float(self.h) < 1.5):
            raise ValueError(f"h = {float(self.h)} out of sane range")


# Planck-2018-like default, matching the reference's defaults.
PLANCK = CosmologyParams()


# ---------------------------------------------------------------------------
# Expansion history
# ---------------------------------------------------------------------------

def de_density_evolution(params: CosmologyParams, a):
    """rho_DE(a)/rho_DE(1) for CPL (w0, wa). Equals 1 for LCDM."""
    a = jnp.asarray(a)
    return a ** (-3.0 * (1.0 + params.w0 + params.wa)) * jnp.exp(
        -3.0 * params.wa * (1.0 - a))


def e2_function(params: CosmologyParams, a):
    """E^2(a) = H^2(a)/H0^2 (reference: cosmology_model.hpp:49-61, plus
    radiation and evolving dark energy)."""
    a = jnp.asarray(a)
    return (params.omega_r * a ** -4
            + params.omega_m * a ** -3
            + params.omega_k * a ** -2
            + params.omega_lambda * de_density_evolution(params, a))


def e_function(params: CosmologyParams, a):
    """E(a) = H(a)/H0."""
    return jnp.sqrt(e2_function(params, a))


def hubble(params: CosmologyParams, a):
    """H(a) in km/s/Mpc (reference: hubble_parameter_a,
    cosmology_model.hpp:58-61)."""
    return params.h0 * e_function(params, a)


def hubble_z(params: CosmologyParams, z):
    """H(z) in km/s/Mpc."""
    return hubble(params, 1.0 / (1.0 + jnp.asarray(z)))


def omega_m_a(params: CosmologyParams, a):
    """Omega_m(a) = Omega_m a^-3 / E^2(a) (reference:
    cosmology_model.hpp:64-70)."""
    a = jnp.asarray(a)
    return params.omega_m * a ** -3 / e2_function(params, a)


def omega_lambda_a(params: CosmologyParams, a):
    """Omega_Lambda(a) (reference: cosmology_model.hpp:72-77)."""
    return (params.omega_lambda * de_density_evolution(params, a)
            / e2_function(params, a))


# ---------------------------------------------------------------------------
# Linear growth
# ---------------------------------------------------------------------------

def _cpt92_g(params: CosmologyParams, a):
    """Carroll, Press & Turner (1992) growth suppression factor g(a).

    Same approximation the reference uses (cosmology_model.hpp:80-91 and
    power_spectrum.cu:412-423).
    """
    om = omega_m_a(params, a)
    ol = omega_lambda_a(params, a)
    return 2.5 * om / (om ** (4.0 / 7.0) - ol
                       + (1.0 + om / 2.0) * (1.0 + ol / 70.0))


def growth_factor(params: CosmologyParams, a):
    """Linear growth factor D(a), CPT92 approximation, normalized D(1)=1
    (reference: cosmology_model.hpp:80-91)."""
    a = jnp.asarray(a)
    return a * _cpt92_g(params, a) / _cpt92_g(params, 1.0)


def growth_rate(params: CosmologyParams, a):
    """f(a) = dlnD/dlna ~= Omega_m(a)^0.55 (reference:
    cosmology_model.hpp:94-97)."""
    return omega_m_a(params, a) ** 0.55


@partial(jax.jit, static_argnames=("n_steps",))
def growth_factor_exact(params: CosmologyParams, a, *, n_steps: int = 256):
    """ODE-exact linear growth factor, normalized to D(1)=1.

    Integrates the standard second-order growth ODE in x = ln a:
        D'' + (2 + dlnH/dlna) D' = (3/2) Omega_m(a) D
    with matter-dominated initial conditions D ~ a at a_init=1e-3, using a
    fixed-step RK4 under `lax.scan` (jit-friendly, differentiable). This is
    the high-fidelity upgrade over the reference's CPT92 approximation.
    """
    a = jnp.asarray(a, dtype=jnp.float64 if jax.config.read(
        "jax_enable_x64") else jnp.float32)
    x0 = jnp.log(1e-3)
    x1 = jnp.log(jnp.maximum(jnp.max(a), 1.0))
    dx = (x1 - x0) / n_steps

    def dlnh_dlna(x):
        aa = jnp.exp(x)
        # d ln H / d ln a = (1/2) d ln E^2 / d ln a
        e2 = e2_function(params, aa)
        de2 = (-4.0 * params.omega_r * aa ** -4
               - 3.0 * params.omega_m * aa ** -3
               - 2.0 * params.omega_k * aa ** -2
               + params.omega_lambda * (
                   de_density_evolution(params, aa)
                   * (-3.0 * (1.0 + params.w0 + params.wa)
                      + 3.0 * params.wa * aa)))
        return 0.5 * de2 / e2

    def rhs(x, state):
        d, dp = state
        om = omega_m_a(params, jnp.exp(x))
        return jnp.stack([dp, 1.5 * om * d - (2.0 + dlnh_dlna(x)) * dp])

    def rk4_step(state, x):
        k1 = rhs(x, state)
        k2 = rhs(x + dx / 2, state + dx / 2 * k1)
        k3 = rhs(x + dx / 2, state + dx / 2 * k2)
        k4 = rhs(x + dx, state + dx * k3)
        new = state + dx / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return new, new

    init = jnp.stack([jnp.exp(x0), jnp.exp(x0)])  # D ~ a, D' = D in MD era
    xs = x0 + dx * jnp.arange(n_steps)
    _, traj = jax.lax.scan(rk4_step, init, xs)
    grid_x = x0 + dx * (1 + jnp.arange(n_steps))
    d_grid = traj[:, 0]
    # interpolate D(ln a) onto requested a; normalize at a=1
    d_at = jnp.interp(jnp.log(a), grid_x, d_grid)
    d_one = jnp.interp(0.0, grid_x, d_grid)
    return d_at / d_one


# ---------------------------------------------------------------------------
# Fixed-order quadrature helpers
# ---------------------------------------------------------------------------

def _gauss_legendre(n: int):
    """Nodes/weights on [-1, 1] (host-side numpy; cached by closure)."""
    import numpy as np
    x, w = np.polynomial.legendre.leggauss(n)
    return jnp.asarray(x), jnp.asarray(w)


_GL_X, _GL_W = _gauss_legendre(128)


def _integrate(fn, lo, hi):
    """∫_lo^hi fn(x) dx with 128-point Gauss-Legendre (static shapes)."""
    mid = 0.5 * (hi + lo)
    half = 0.5 * (hi - lo)
    return half * jnp.sum(_GL_W * fn(mid + half * _GL_X))


# ---------------------------------------------------------------------------
# Distances and times
# ---------------------------------------------------------------------------

def comoving_distance(params: CosmologyParams, z):
    """Line-of-sight comoving distance D_C(z) in Mpc (reference:
    cosmology_model.cpp:12-26 / hpp:112-120). Vectorized over z."""
    z = jnp.atleast_1d(jnp.asarray(z, jnp.float32))
    d_h = C_KM_S / params.h0

    def one(zi):
        return d_h * _integrate(
            lambda zp: 1.0 / e_function(params, 1.0 / (1.0 + zp)), 0.0, zi)

    out = jax.vmap(one)(z)
    return out if out.shape != (1,) else out[0]


def scale_factor_at_chi(params: CosmologyParams, chi, *,
                        z_max: float = 20.0, n_grid: int = 256):
    """Inverse of the comoving distance: a(chi) with chi in Mpc.

    Tabulates chi(z) on a z grid and interpolates (monotone); chi beyond
    chi(z_max) clamps to a(z_max). Vectorized over chi. Needed for
    per-lens-plane scale factors in the lightcone builder."""
    z_grid = jnp.linspace(0.0, z_max, n_grid)
    chi_grid = comoving_distance(params, z_grid)
    z_of_chi = jnp.interp(jnp.asarray(chi, jnp.float32), chi_grid, z_grid)
    return 1.0 / (1.0 + z_of_chi)


def transverse_comoving_distance(params: CosmologyParams, z):
    """D_M(z): comoving distance corrected for curvature (reference:
    cosmology_model.hpp:123-138 handles open/flat/closed)."""
    d_c = comoving_distance(params, z)
    d_h = C_KM_S / params.h0
    sqrt_ok = jnp.sqrt(jnp.abs(params.omega_k) + 1e-30)
    x = sqrt_ok * d_c / d_h
    open_case = d_h / sqrt_ok * jnp.sinh(x)
    closed_case = d_h / sqrt_ok * jnp.sin(x)
    return jnp.where(params.omega_k > 1e-8, open_case,
                     jnp.where(params.omega_k < -1e-8, closed_case, d_c))


def angular_diameter_distance(params: CosmologyParams, z):
    """D_A(z) = D_M / (1+z) (reference: cosmology_model.hpp:141-144)."""
    return transverse_comoving_distance(params, z) / (1.0 + jnp.asarray(z))


def luminosity_distance(params: CosmologyParams, z):
    """D_L(z) = (1+z) D_M (reference: cosmology_model.hpp:146-149)."""
    return (1.0 + jnp.asarray(z)) * transverse_comoving_distance(params, z)


def conformal_time(params: CosmologyParams, a):
    """Conformal time eta(a) = ∫_0^a da' / (a'^2 H(a')) in Mpc/c units
    (returned in Mpc) (reference: cosmology_model.cpp:28-43)."""
    a = jnp.asarray(a)
    d_h = C_KM_S / params.h0
    # substitute a' = exp(x) to handle the a->0 endpoint smoothly
    lo = jnp.log(1e-8)

    def integrand(x):
        aa = jnp.exp(x)
        return 1.0 / (aa * e_function(params, aa))

    return d_h * _integrate(integrand, lo, jnp.log(a))


def cosmic_time(params: CosmologyParams, a):
    """Cosmic time t(a) = (1/H0) ∫_0^a da'/(a' E(a')) in Gyr (reference:
    cosmology_model.cpp:45-58)."""
    a = jnp.asarray(a)
    lo = jnp.log(1e-8)

    def integrand(x):
        return 1.0 / e_function(params, jnp.exp(x))

    h0_inv_gyr = _H_INV_TO_GYR / params.h0
    return h0_inv_gyr * _integrate(integrand, lo, jnp.log(a))


def age_of_universe(params: CosmologyParams):
    """t(a=1) in Gyr (reference: cosmology_model.cpp:60-67)."""
    return cosmic_time(params, 1.0)


def lookback_time(params: CosmologyParams, z):
    """t(1) - t(1/(1+z)) in Gyr."""
    return age_of_universe(params) - cosmic_time(
        params, 1.0 / (1.0 + jnp.asarray(z)))


def scale_factor_to_redshift(a):
    """z = 1/a - 1 (reference: simulation_context get_redshift)."""
    return 1.0 / jnp.asarray(a) - 1.0


def redshift_to_scale_factor(z):
    return 1.0 / (1.0 + jnp.asarray(z))
