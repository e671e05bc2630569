"""Cosmological initial conditions: Gaussian random fields, Zel'dovich (1LPT)
and 2LPT displacements, on-device with real 3D FFTs.

Capability parity with the reference's InitialConditionsGenerator
(include/physics/initial_conditions.hpp:58-276,
src/physics/initial_conditions.cpp:36-757): tabulated-P(k)-free Gaussian
delta(k) realization, Zel'dovich displacement Psi = ik/k^2 delta, growth-
scaled velocities, 2LPT second-order correction, glass/uniform/grid particle
loads, and statistical validation.

Fidelity fixes over the reference (SURVEY.md section 2.4):
  * the reference never inverse-FFTs its displacement field (it assigns
    per-k-mode values to same-index real-space cells,
    initial_conditions.cpp:304-332); here displacements are genuine
    irfftn transforms of ik/k^2 delta_k.
  * Hermitian symmetry is exact by construction: the Gaussian field is
    generated as white noise in real space and FFT'd, instead of
    hand-patching conjugate modes (initial_conditions.cpp:443-471).
  * 2LPT uses the full second-order source (sum of principal-minor
    determinants of the tidal tensor) computed spectrally, not the +/-1
    neighborhood approximation (initial_conditions.cpp:565-722).

Conventions: box L in Mpc/h, k in h/Mpc, delta_k in the jnp.fft layout.
P(k) is drawn at z=0 and scaled back with the linear growth factor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cosmology import (CosmologyParams, growth_factor, growth_rate,
                        omega_m_a)
from .integrators import hubble_internal
from .power_spectra import TRANSFERS, linear_power
from ..core.state import SimState, make_state

# critical density in (1e10 Msun/h) / (Mpc/h)^3 for H0=100 internal, G=43.007
RHO_CRIT = 27.753662724570805


# ---------------------------------------------------------------------------
# k-space helpers
# ---------------------------------------------------------------------------

def fourier_grid(ng: int, box_size: float, dtype=jnp.float32):
    """Wavevectors (kx, ky, kz, k2) for an rfftn-layout grid.
    k in h/Mpc when box_size is in Mpc/h."""
    two_pi = 2.0 * jnp.pi
    kf = jnp.fft.fftfreq(ng, d=1.0 / ng).astype(dtype) * (two_pi / box_size)
    kr = jnp.fft.rfftfreq(ng, d=1.0 / ng).astype(dtype) * (two_pi / box_size)
    kx = kf[:, None, None]
    ky = kf[None, :, None]
    kz = kr[None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    return kx, ky, kz, k2


@partial(jax.jit, static_argnames=("ng", "transfer", "fixed_amplitude"))
def gaussian_delta_k(key, ng: int, box_size: float,
                     params: CosmologyParams,
                     transfer: str = "eisenstein_hu",
                     fixed_amplitude: bool = False):
    """Gaussian linear density field delta_k at z=0 in rfftn layout.

    Generated as rfftn(white noise) * sqrt(P(k) * ng^3 / V) so Hermitian
    symmetry holds exactly (reference: generate_gaussian_field,
    initial_conditions.cpp:227-258, which patches conjugates by hand).

    `fixed_amplitude=True` gives "fixed & paired"-style ICs (|delta_k| set
    exactly to sqrt(P), random phases only) for variance-suppressed tests.
    """
    volume = box_size ** 3
    white = jax.random.normal(key, (ng, ng, ng), dtype=jnp.float32)
    dk = jnp.fft.rfftn(white)
    _, _, _, k2 = fourier_grid(ng, box_size)
    k = jnp.sqrt(k2)
    t_fn = TRANSFERS[transfer] if isinstance(transfer, str) else transfer
    pk = linear_power(params, jnp.maximum(k, 1e-6), z=0.0, transfer=t_fn)
    pk = jnp.where(k2 > 0, pk, 0.0)  # DC mode = 0 (mean density)
    if fixed_amplitude:
        mag = jnp.abs(dk)
        dk = jnp.where(mag > 0, dk / jnp.maximum(mag, 1e-30), 0.0)
        dk = dk * jnp.sqrt(pk * float(ng) ** 6 / volume)
    else:
        dk = dk * jnp.sqrt(pk * float(ng) ** 3 / volume)
    return dk.astype(jnp.complex64)


def displacement_from_delta(delta_k, ng: int, box_size: float):
    """Zel'dovich displacement field Psi_k = i k / k^2 delta_k, inverse
    transformed to real space -> [3, ng, ng, ng]
    (reference: compute_displacement_field, initial_conditions.cpp:304-332,
    minus its missing-inverse-FFT bug)."""
    kx, ky, kz, k2 = fourier_grid(ng, box_size)
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    psi = []
    for kvec in (kx, ky, kz):
        psi_k = 1j * kvec * inv_k2 * delta_k
        psi.append(jnp.fft.irfftn(psi_k, s=(ng, ng, ng)))
    return jnp.stack(psi)


def second_order_displacement(delta_k, ng: int, box_size: float):
    """2LPT displacement potential gradient: solves
        lap(phi2) = sum_{i<j} [phi1,ii phi1,jj - (phi1,ij)^2],
    with lap(phi1) = delta, all spectrally. Returns the *unit-growth*
    second-order displacement field [3, ng, ng, ng] such that
        Psi = D1 * Psi1 + D2 * Psi2,  D2 = -3/7 Omega_m(a)^(-1/143) D1^2
    (reference: compute_second_order_displacement,
    initial_conditions.cpp:565-722, which approximated the convolution with
    a +/-1 neighborhood stencil)."""
    kx, ky, kz, k2 = fourier_grid(ng, box_size)
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    phi1_k = -delta_k * inv_k2            # lap phi1 = delta

    def d2(ka, kb):
        return jnp.fft.irfftn(-ka * kb * phi1_k, s=(ng, ng, ng))

    pxx, pyy, pzz = d2(kx, kx), d2(ky, ky), d2(kz, kz)
    pxy, pxz, pyz = d2(kx, ky), d2(kx, kz), d2(ky, kz)
    source = (pxx * pyy + pxx * pzz + pyy * pzz
              - pxy * pxy - pxz * pxz - pyz * pyz)
    s_k = jnp.fft.rfftn(source)
    # Psi2 = grad(phi2) with lap(phi2) = S  =>  Psi2_k = -i k S_k / k^2
    # (Bouchet+95 / 2LPTic convention; the physical displacement is
    # D2 * Psi2 with D2 = -3/7 Omega_m^(-1/143) D1^2 applied by the
    # caller, so div(D2 Psi2) = D2 S < 0 in overdense regions: 2LPT
    # deepens infall. Spectral identity: i k . Psi2_k = +S_k.)
    psi2 = []
    for kvec in (kx, ky, kz):
        psi2.append(jnp.fft.irfftn(-1j * kvec * inv_k2 * s_k,
                                   s=(ng, ng, ng)))
    return jnp.stack(psi2)


# ---------------------------------------------------------------------------
# Particle loads
# ---------------------------------------------------------------------------

def lattice_positions(n_side: int, box_size: float):
    """Uniform grid particle load q at cell centers -> [n^3, 3]."""
    idx = (jnp.arange(n_side, dtype=jnp.float32) + 0.5) * (box_size / n_side)
    qx, qy, qz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    return jnp.stack([qx.ravel(), qy.ravel(), qz.ravel()], axis=-1)


def _sample_field_at_lattice(field, n_side: int, ng: int):
    """Sample a [3, ng, ng, ng] grid field at an n_side^3 lattice
    (requires ng % n_side == 0); -> [n^3, 3]."""
    if ng % n_side:
        raise ValueError(
            f"LPT IC grid ng={ng} must be a multiple of n_side="
            f"{n_side} (lattice sites must coincide with grid points; "
            f"a fractional stride would silently mis-sample)")
    stride = ng // n_side
    sub = field[:, ::stride, ::stride, ::stride]
    return sub.reshape(3, -1).T


def ic_velocity_prefactor(params: CosmologyParams, a, h0_internal: float,
                          kick_mode: str = "reference"):
    """Convert a displacement (already scaled to a) into the integrator's
    velocity variable:
      v = dx/dt = H(a) f(a) Psi            for kick_mode reference/newtonian
      u = a^2 dx/dt = a^2 H f Psi          for kick_mode comoving
    (reference: compute_velocity_field v = aHf Psi,
    initial_conditions.cpp:334-356 -- their convention for proper peculiar
    velocity; ours matches the drift variable actually integrated)."""
    h = hubble_internal(params, a, h0_internal)
    f = growth_rate(params, a)
    pref = h * f
    if kick_mode == "comoving":
        pref = pref * a * a
    return pref


# ---------------------------------------------------------------------------
# Top-level generators
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ng", "n_side", "use_2lpt", "transfer",
                                   "h0_internal", "kick_mode",
                                   "fixed_amplitude"))
def lpt_displacements(key, params: CosmologyParams, *, ng: int,
                      n_side: int, box_size: float, a_init,
                      use_2lpt: bool = True,
                      transfer: str = "eisenstein_hu",
                      h0_internal: float = 100.0,
                      kick_mode: str = "reference",
                      fixed_amplitude: bool = False):
    """Generate (positions, velocities) for an n_side^3 particle load from
    an ng^3 Gaussian realization (reference: generate_initial_conditions,
    initial_conditions.cpp:201-225 + apply_zeldovich_approximation
    :260-302)."""
    delta_k = gaussian_delta_k(key, ng, box_size, params, transfer,
                               fixed_amplitude)
    d1 = growth_factor(params, a_init)
    om_a = omega_m_a(params, a_init)

    psi1 = displacement_from_delta(delta_k, ng, box_size)  # unit growth (z=0)
    psi1_l = _sample_field_at_lattice(psi1, n_side, ng) * d1

    q = lattice_positions(n_side, box_size)
    disp = psi1_l
    vel_pref = ic_velocity_prefactor(params, a_init, h0_internal, kick_mode)
    f1 = growth_rate(params, a_init)
    vel = vel_pref * psi1_l

    if use_2lpt:
        d2 = -3.0 / 7.0 * om_a ** (-1.0 / 143.0) * d1 * d1
        f2 = 2.0 * om_a ** (6.0 / 11.0)
        psi2 = second_order_displacement(delta_k, ng, box_size)
        psi2_l = _sample_field_at_lattice(psi2, n_side, ng) * d2
        disp = disp + psi2_l
        # velocity gets its own growth rate per order:
        # v = H (f1 D1 Psi1 + f2 D2 Psi2)
        vel = vel + (vel_pref / f1) * f2 * psi2_l

    pos = jnp.mod(q + disp, box_size)
    return pos, vel


def glass_positions(key, n: int, box_size: float, iterations: int = 20,
                    softening: float | None = None):
    """Glass-like particle load: random points relaxed by *repulsive*
    gravity steps until quasi-uniform (reference stub: create_glass_state,
    initial_conditions.cpp:738-757, which just returned random points)."""
    from ..forces.direct import direct_accelerations_chunked
    pos = jax.random.uniform(key, (n, 3), minval=0.0, maxval=box_size)
    if softening is None:
        softening = 0.05 * box_size / max(round(n ** (1 / 3)), 1)
    mean_sep = box_size / max(n ** (1 / 3), 1.0)
    step_scale = 0.05 * mean_sep

    def body(pos, _):
        acc = direct_accelerations_chunked(
            pos, jnp.ones((n,), pos.dtype), box_size, softening, 1.0)
        norm = jnp.maximum(jnp.max(jnp.abs(acc)), 1e-30)
        pos = jnp.mod(pos - step_scale * acc / norm, box_size)
        return pos, None

    pos, _ = jax.lax.scan(body, pos, None, length=iterations)
    return pos


def generate_state(config) -> SimState:
    """Config-driven IC dispatch (the IParticleGenerator role,
    include/core/interfaces.hpp:59-68). Returns a ready SimState at
    a_init = 1/(1+initial_redshift)."""
    ic = config.particles.initial_conditions
    n = config.particles.num_particles
    box = config.particles.box_size
    a_init = 1.0 / (1.0 + config.cosmology.initial_redshift)
    params = config.cosmology_params()
    key = jax.random.PRNGKey(ic.random_seed)
    key, sub = jax.random.split(key)

    if config.units.system == "box":
        mass = 1.0
        total = float(n)
    else:
        total = RHO_CRIT * float(params.omega_m) * box ** 3
        mass = total / n
    masses = jnp.full((n,), mass, jnp.float32)

    kind = ic.type.lower()
    if kind in ("zeldovich", "2lpt", "zel'dovich", "zeldovichgenerator"):
        n_side = round(n ** (1.0 / 3.0))
        if n_side ** 3 != n:
            raise ValueError(
                f"LPT ICs need a cubic particle number; got {n} "
                f"(nearest cube {n_side ** 3})")
        ng = max(ic.grid_size, n_side)
        if ng % n_side != 0:
            ng = n_side * max(1, round(ng / n_side))
        use_2lpt = ic.use_2lpt or kind == "2lpt"
        # per-generator power_spectrum wins; empty inherits the
        # cosmology-level transfer_function choice
        transfer = ic.power_spectrum or config.cosmology.transfer_function
        pos, vel = lpt_displacements(
            sub, params, ng=ng, n_side=n_side, box_size=box, a_init=a_init,
            use_2lpt=use_2lpt,
            transfer=transfer,
            h0_internal=config.units.H0_internal,
            kick_mode=config.integration.kick_mode)
        if not ic.velocity_perturbations:
            vel = jnp.zeros_like(vel)
    elif kind in ("uniform_random", "random"):
        pos = jax.random.uniform(sub, (n, 3), minval=0.0, maxval=box)
        vel = jnp.zeros((n, 3), jnp.float32)
    elif kind == "grid":
        n_side = round(n ** (1.0 / 3.0))
        if n_side ** 3 != n:
            raise ValueError(f"grid ICs need a cubic N; got {n}")
        pos = lattice_positions(n_side, box)
        vel = jnp.zeros((n, 3), jnp.float32)
    elif kind == "glass":
        pos = glass_positions(sub, n, box)
        vel = jnp.zeros((n, 3), jnp.float32)
    else:
        raise ValueError(f"unknown IC generator {ic.type!r}")

    return make_state(pos, vel, masses, scale_factor=a_init,
                      time=config.time.initial_time, rng_key=key)


# ---------------------------------------------------------------------------
# Validation / statistics
# ---------------------------------------------------------------------------

def displacement_statistics(positions, box_size: float, n_side: int):
    """RMS/max displacement from the lattice (reference:
    initial_conditions.cpp:477-563 validation statistics)."""
    q = lattice_positions(n_side, box_size)
    from ..forces.direct import min_image
    d = min_image(positions - q, box_size)
    mag = jnp.sqrt(jnp.sum(d * d, axis=-1))
    return {"rms_displacement": jnp.sqrt(jnp.mean(mag ** 2)),
            "max_displacement": jnp.max(mag),
            "mean_displacement": jnp.mean(mag)}


def validate_initial_conditions(state: SimState, box_size: float) -> dict:
    """Bounds/finiteness/mass checks (reference:
    validate_initial_conditions, initial_conditions.cpp:823-853)."""
    pos, vel = state.positions, state.velocities
    return {
        "positions_finite": bool(jnp.all(jnp.isfinite(pos))),
        "velocities_finite": bool(jnp.all(jnp.isfinite(vel))),
        "in_box": bool(jnp.all((pos >= 0) & (pos < box_size))),
        "masses_positive": bool(jnp.all(state.masses > 0)),
        "rms_velocity": float(jnp.sqrt(jnp.mean(jnp.sum(vel * vel, -1)))),
    }
