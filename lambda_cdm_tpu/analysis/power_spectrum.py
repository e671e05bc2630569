"""On-device power-spectrum analyzer: mass assignment, FFT, spherical
binning, shot noise, sigma8-from-P(k).

TPU-native rebuild of the reference's PowerSpectrumAnalyzer
(include/analysis/power_spectrum.hpp:26-115, src/analysis/power_spectrum.cu:
53-332): CIC/NGP (plus TSC, which the reference declares but never
implements) mass assignment with periodic wrap, R2C FFT (jnp.fft.rfftn --
replacing the FFTW/cuFFT dual path), spherical k-binning with Hermitian
multiplicity, volume normalization, shot-noise subtraction, and window
deconvolution (an accuracy upgrade the reference lacks).

Everything is jit-friendly with static shapes; the binned sums use
segment-sum over precomputed bin indices.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.matmul_fft import rfftn as _rfftn

from ..physics.initial_conditions import fourier_grid


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PowerSpectrumData:
    """Binned P(k) (reference: PowerSpectrumData,
    include/analysis/power_spectrum.hpp:15-24)."""
    k: jax.Array            # [nbins] bin-averaged k [h/Mpc]
    power: jax.Array        # [nbins] P(k) [(Mpc/h)^3], shot-noise subtracted
    power_raw: jax.Array    # [nbins] before shot-noise subtraction
    counts: jax.Array       # [nbins] number of modes per bin
    shot_noise: jax.Array   # [] V/N
    box_size: jax.Array     # []
    num_particles: jax.Array  # []


# ---------------------------------------------------------------------------
# Mass assignment
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ng",))
def ngp_deposit(positions, ng: int, box_size, weights=None):
    """Nearest-grid-point deposit (reference: assign_particles_to_grid_ngp,
    power_spectrum.cu:137-159)."""
    n = positions.shape[0]
    w = jnp.ones((n,), positions.dtype) if weights is None else weights
    cell = jnp.floor(positions / box_size * ng).astype(jnp.int32) % ng
    flat = (cell[:, 0] * ng + cell[:, 1]) * ng + cell[:, 2]
    grid = jnp.zeros((ng * ng * ng,), positions.dtype)
    grid = grid.at[flat].add(w)
    return grid.reshape(ng, ng, ng)


@partial(jax.jit, static_argnames=("ng",))
def cic_deposit(positions, ng: int, box_size, weights=None):
    """Cloud-in-cell (trilinear) deposit with periodic wrap
    (reference: assign_particles_to_grid_cic, power_spectrum.cu:86-134).

    Scatter-add over the 8 corners; on TPU XLA lowers .at[].add to sorted
    segment updates -- for the PM hot path see ops.deposit for the
    sort-based variant.
    """
    n = positions.shape[0]
    w = jnp.ones((n,), positions.dtype) if weights is None else weights
    u = positions / box_size * ng          # grid coordinates
    i0 = jnp.floor(u - 0.5).astype(jnp.int32)  # cell-centred convention
    frac = (u - 0.5) - i0
    grid = jnp.zeros((ng * ng * ng,), positions.dtype)
    for dx in (0, 1):
        wx = jnp.where(dx == 0, 1.0 - frac[:, 0], frac[:, 0])
        ix = (i0[:, 0] + dx) % ng
        for dy in (0, 1):
            wy = jnp.where(dy == 0, 1.0 - frac[:, 1], frac[:, 1])
            iy = (i0[:, 1] + dy) % ng
            for dz in (0, 1):
                wz = jnp.where(dz == 0, 1.0 - frac[:, 2], frac[:, 2])
                iz = (i0[:, 2] + dz) % ng
                flat = (ix * ng + iy) * ng + iz
                grid = grid.at[flat].add(w * wx * wy * wz)
    return grid.reshape(ng, ng, ng)


@partial(jax.jit, static_argnames=("ng",))
def tsc_deposit(positions, ng: int, box_size, weights=None):
    """Triangular-shaped-cloud deposit (27-point). The reference *declares*
    TSC (initial_conditions.hpp window enum) but never implements it."""
    n = positions.shape[0]
    w = jnp.ones((n,), positions.dtype) if weights is None else weights
    u = positions / box_size * ng
    ic = jnp.floor(u).astype(jnp.int32)    # center cell
    d = u - (ic.astype(u.dtype) + 0.5)     # offset from cell center [-0.5,0.5)
    grid = jnp.zeros((ng * ng * ng,), positions.dtype)

    def w1d(dist):
        ad = jnp.abs(dist)
        return jnp.where(ad < 0.5, 0.75 - ad * ad,
                         jnp.where(ad < 1.5, 0.5 * (1.5 - ad) ** 2, 0.0))

    for dx in (-1, 0, 1):
        wx = w1d(d[:, 0] - dx)
        ix = (ic[:, 0] + dx) % ng
        for dy in (-1, 0, 1):
            wy = w1d(d[:, 1] - dy)
            iy = (ic[:, 1] + dy) % ng
            for dz in (-1, 0, 1):
                wz = w1d(d[:, 2] - dz)
                iz = (ic[:, 2] + dz) % ng
                flat = (ix * ng + iy) * ng + iz
                grid = grid.at[flat].add(w * wx * wy * wz)
    return grid.reshape(ng, ng, ng)


DEPOSITS = {"ngp": ngp_deposit, "cic": cic_deposit, "tsc": tsc_deposit}
_WINDOW_POWER = {"ngp": 1, "cic": 2, "tsc": 3}


def density_contrast(grid):
    """delta = rho/rho_bar - 1 (reference: compute_density_contrast,
    power_spectrum.cu:161-180)."""
    mean = jnp.mean(grid)
    return grid / jnp.maximum(mean, 1e-30) - 1.0


def assignment_window(ng: int, box_size, assignment: str = "cic"):
    """Fourier-space mass-assignment window W(k) for deconvolution:
    W = prod_i sinc(k_i dx / 2)^p, p = 1 (NGP), 2 (CIC), 3 (TSC)."""
    kx, ky, kz, _ = fourier_grid(ng, box_size)
    half_dx = box_size / ng / 2.0

    def sinc(x):
        x = x * half_dx
        return jnp.where(jnp.abs(x) < 1e-12, 1.0, jnp.sin(x) / x)

    p = _WINDOW_POWER[assignment]
    return (sinc(kx) * sinc(ky) * sinc(kz)) ** p


# ---------------------------------------------------------------------------
# Binning
# ---------------------------------------------------------------------------

def _hermitian_multiplicity(ng: int):
    """rfftn stores only kz>=0; every mode with 0 < kz < ng/2 represents
    itself and its conjugate (reference applies the same x2,
    power_spectrum.cu:243-249). -> [ng, ng, ng//2+1] weights."""
    nz = ng // 2 + 1
    mult = jnp.full((nz,), 2.0)
    mult = mult.at[0].set(1.0)
    if ng % 2 == 0:
        mult = mult.at[nz - 1].set(1.0)
    return jnp.broadcast_to(mult[None, None, :], (ng, ng, nz))


def _bin_reduce(rows, bin_idx, num_bins: int, chunk: int = 65536):
    """Sum `rows` [F, M] into [F, num_bins] by `bin_idx` (values ==
    num_bins are discarded).

    On TPU: chunked one-hot GEMMs on the MXU -- jax.ops.segment_sum
    lowers to scatter-add there (~46 ns/element, ~400 ms for a 256^3
    mode set), while 129 [F, 64Ki] x [64Ki, bins] GEMMs take ~1 ms.
    bin_idx is data-independent (pure k-space geometry), so the one-hot
    comparisons fold into the jit at no accuracy cost. Elsewhere:
    segment_sum.
    """
    if jax.default_backend() != "tpu":
        return jax.vmap(lambda r: jax.ops.segment_sum(
            r, bin_idx, num_segments=num_bins + 1))(rows)[:, :num_bins]
    f, m = rows.shape
    pad = (-m) % chunk
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
        bin_idx = jnp.pad(bin_idx, (0, pad), constant_values=num_bins)
    nb = num_bins + 1
    rows = rows.reshape(f, -1, chunk).transpose(1, 0, 2)   # [C, F, chunk]
    bidx = bin_idx.reshape(-1, chunk)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)

    def body(acc, xs):
        r, b = xs
        onehot = (b[:, None] == iota).astype(rows.dtype)   # [chunk, nb]
        return acc + jnp.dot(r, onehot,
                             precision=jax.lax.Precision.HIGHEST), None

    out, _ = jax.lax.scan(body, jnp.zeros((f, nb), rows.dtype),
                          (rows, bidx))
    return out[:, :num_bins]


def _bin_index(kmag_flat, k_lo, k_hi, num_bins: int, log_bins: bool = True):
    """Closed-form uniform bin index (replaces jnp.searchsorted).

    Bin edges are uniform in k or log k by construction, so the index is
    floor((f(k) - f(k_lo)) / (f(k_hi) - f(k_lo)) * B) with f = log or
    identity. On TPU, searchsorted over the 8.4M-mode 256^3 grid costs
    ~568 ms (binary-search gathers); the closed form costs ~13 ms. A
    mode within one float ulp of a bin edge may land in the neighboring
    bin (~2e-4 of modes at 256^3) -- statistically irrelevant for
    binned averages. Out-of-range values (including k == 0, guarded
    before the log) map outside [0, num_bins) and are masked by
    callers' `valid` tests.
    """
    if log_bins:
        k_safe = jnp.maximum(kmag_flat, 1e-30)
        t = (jnp.log(k_safe) - jnp.log(k_lo)) / (jnp.log(k_hi)
                                                 - jnp.log(k_lo))
    else:
        t = (kmag_flat - k_lo) / (k_hi - k_lo)
    return jnp.floor(t * num_bins).astype(jnp.int32)


@partial(jax.jit, static_argnames=("ng", "num_bins", "assignment",
                                   "deconvolve", "log_bins"))
def power_from_delta(delta, *, ng: int, box_size, num_particles,
                     num_bins: int = 64, k_min=None, k_max=None,
                     assignment: str = "cic", deconvolve: bool = True,
                     log_bins: bool = True) -> PowerSpectrumData:
    """Spherically binned P(k) from a real-space density-contrast grid
    (reference: bin_power_spectrum, power_spectrum.cu:207-285)."""
    volume = box_size ** 3
    delta_k = _rfftn(delta)
    if deconvolve:
        delta_k = delta_k / assignment_window(ng, box_size, assignment)
    # |delta_k|^2 * V / ng^6 is the standard P(k) estimator
    pk3d = (delta_k.real ** 2 + delta_k.imag ** 2) * (volume / float(ng) ** 6)

    _, _, _, k2 = fourier_grid(ng, box_size)
    kmag = jnp.sqrt(k2)
    mult = _hermitian_multiplicity(ng)

    kf = 2.0 * jnp.pi / box_size
    knyq = jnp.pi * ng / box_size
    k_lo = kf if k_min is None else k_min
    k_hi = knyq if k_max is None else k_max

    bin_idx = _bin_index(kmag.ravel(), k_lo, k_hi, num_bins,
                         log_bins=log_bins)
    valid = (bin_idx >= 0) & (bin_idx < num_bins) & (kmag.ravel() > 0)
    bin_idx = jnp.where(valid, bin_idx, num_bins)  # overflow bucket

    wts = jnp.where(valid, mult.ravel(), 0.0)
    psum, ksum, counts = _bin_reduce(
        jnp.stack([wts * pk3d.ravel(), wts * kmag.ravel(), wts]),
        bin_idx, num_bins)

    safe = jnp.maximum(counts, 1e-30)
    p_raw = psum / safe
    k_avg = ksum / safe
    shot = volume / jnp.maximum(
        jnp.asarray(num_particles, jnp.float32), 1.0)
    p_sub = jnp.where(counts > 0, p_raw - shot, 0.0)
    return PowerSpectrumData(
        k=k_avg, power=p_sub, power_raw=p_raw, counts=counts,
        shot_noise=jnp.asarray(shot),
        box_size=jnp.asarray(box_size),
        num_particles=jnp.asarray(num_particles))


def measure_power_spectrum(positions, box_size, ng: int = 128,
                           weights=None, num_bins: int = 64,
                           assignment: str = "cic",
                           subtract_shot_noise: bool = True,
                           deconvolve: bool = True,
                           k_min=None, k_max=None) -> PowerSpectrumData:
    """Particles -> P(k) in one call (reference:
    PowerSpectrumAnalyzer::compute_power_spectrum,
    power_spectrum.cu:53-84)."""
    grid = DEPOSITS[assignment](positions, ng, box_size, weights)
    delta = density_contrast(grid)
    data = power_from_delta(
        delta, ng=ng, box_size=box_size,
        num_particles=positions.shape[0], num_bins=num_bins,
        assignment=assignment, deconvolve=deconvolve,
        k_min=k_min, k_max=k_max)
    if not subtract_shot_noise:
        data = dataclasses.replace(data, power=data.power_raw)
    return data


def cross_power_spectrum(positions_a, positions_b, box_size, ng: int = 128,
                         num_bins: int = 64, assignment: str = "cic"):
    """Cross-spectrum P_ab(k) (declared-only in the reference,
    power_spectrum.hpp:57-60)."""
    da = density_contrast(DEPOSITS[assignment](positions_a, ng, box_size))
    db = density_contrast(DEPOSITS[assignment](positions_b, ng, box_size))
    volume = box_size ** 3
    fa = _rfftn(da)
    fb = _rfftn(db)
    if assignment in _WINDOW_POWER:
        w = assignment_window(ng, box_size, assignment)
        fa, fb = fa / w, fb / w
    pk3d = (fa * jnp.conj(fb)).real * (volume / float(ng) ** 6)

    _, _, _, k2 = fourier_grid(ng, box_size)
    kmag = jnp.sqrt(k2)
    mult = _hermitian_multiplicity(ng)
    kf = 2.0 * jnp.pi / box_size
    knyq = jnp.pi * ng / box_size
    bin_idx = _bin_index(kmag.ravel(), kf, knyq, num_bins)
    valid = (bin_idx >= 0) & (bin_idx < num_bins) & (kmag.ravel() > 0)
    bin_idx = jnp.where(valid, bin_idx, num_bins)
    wts = jnp.where(valid, mult.ravel(), 0.0)
    psum, ksum, counts = _bin_reduce(
        jnp.stack([wts * pk3d.ravel(), wts * kmag.ravel(), wts]),
        bin_idx, num_bins)
    safe = jnp.maximum(counts, 1e-30)
    return ksum / safe, psum / safe, counts


@partial(jax.jit, static_argnames=("num_bins", "log_bins"))
def angular_power_spectrum(map_a, fov, map_b=None, *, num_bins: int = 24,
                           ell_min=None, ell_max=None,
                           log_bins: bool = True):
    """Flat-sky angular (cross-)power spectrum C_ell of a square map.

    Closes the loop from the raytracer's kappa/gamma maps
    (raytracing.lensing.raytraced_maps_from_state) back to a binned
    observable -- the 2D analogue of power_from_delta. The reference
    framework has no map-space spectra at all; its raytracing README
    north star stops at the maps.

    `map_a` (and optional `map_b` for a cross-spectrum) is [n, n] over
    a `fov` x `fov` (radians) field; returns (ell, C_ell, counts) with
    ell the bin-averaged multipole. Estimator: C_ell = |kappa_hat|^2 /
    Omega with the continuum transform kappa_hat = pix^2 * DFT(map),
    Omega = fov^2; modes binned by |l|, rfft2 half-plane weighted by
    Hermitian multiplicity. On TPU the transform is the MXU
    DFT-by-matmul (ops/matmul_fft) and binning is chunked one-hot
    GEMMs (_bin_reduce) -- no scatters.
    """
    n = map_a.shape[-1]
    pix = fov / n
    fa = _rfftn(map_a[None])[0]                      # [n, n//2 + 1]
    fb = fa if map_b is None else _rfftn(map_b[None])[0]
    spec = (fa.real * fb.real + fa.imag * fb.imag) \
        * (pix ** 4 / (fov * fov))

    nz = n // 2 + 1
    # fftfreq/rfftfreq by hand: `pix` may be traced (fov is not static)
    idx = jnp.arange(n)
    lx = 2.0 * jnp.pi * jnp.where(idx <= (n - 1) // 2, idx, idx - n) \
        / (n * pix)                                  # [n]
    ly = 2.0 * jnp.pi * jnp.arange(nz) / (n * pix)   # [nz]
    lmag = jnp.sqrt(lx[:, None] ** 2 + ly[None, :] ** 2)
    mult = jnp.full((nz,), 2.0).at[0].set(1.0)
    if n % 2 == 0:
        mult = mult.at[nz - 1].set(1.0)
    mult = jnp.broadcast_to(mult[None, :], (n, nz))

    l_lo = (2.0 * jnp.pi / fov) if ell_min is None else ell_min
    # default reach includes the corner modes (|l| up to sqrt(2) Nyq)
    l_hi = (jnp.sqrt(2.0) * jnp.pi * n / fov) * (1 + 1e-6) \
        if ell_max is None else ell_max
    bin_idx = _bin_index(lmag.ravel(), l_lo, l_hi, num_bins,
                         log_bins=log_bins)
    valid = (bin_idx >= 0) & (bin_idx < num_bins) & (lmag.ravel() > 0)
    bin_idx = jnp.where(valid, bin_idx, num_bins)
    wts = jnp.where(valid, mult.ravel(), 0.0)
    csum, lsum, counts = _bin_reduce(
        jnp.stack([wts * spec.ravel(), wts * lmag.ravel(), wts]),
        bin_idx, num_bins)
    safe = jnp.maximum(counts, 1e-30)
    return lsum / safe, csum / safe, counts


@partial(jax.jit, static_argnames=("num_bins", "log_bins"))
def shear_eb_spectra(gamma1, gamma2, fov, *, num_bins: int = 24,
                     ell_min=None, ell_max=None, log_bins: bool = True):
    """Flat-sky E/B decomposition of a shear map -> (ell, C_EE, C_BB,
    C_EB, counts).

    E(l) = cos(2 phi_l) g1(l) + sin(2 phi_l) g2(l),
    B(l) = -sin(2 phi_l) g1(l) + cos(2 phi_l) g2(l), phi_l the mode
    angle. For shear derived from any scalar lensing potential,
    C_EE = C_kappakappa and C_BB = 0 (B modes only from post-Born
    coupling, systematics, or noise) -- the standard weak-lensing
    null test, validated by tests/test_angular_power.py against the
    module's own kappa -> gamma chain. Same estimator normalization
    and binning as angular_power_spectrum.

    Caveat: modes on the axis-Nyquist rows (|l_i| = pi*n/fov, even n)
    have sign-ambiguous mode angles under the real FFT, leaking ~0.4%
    E power into B in the bins that contain them; pass
    ell_max < pi*n/fov for a clean null test.
    """
    n = gamma1.shape[-1]
    pix = fov / n
    g1 = _rfftn(gamma1[None])[0]
    g2 = _rfftn(gamma2[None])[0]

    nz = n // 2 + 1
    idx = jnp.arange(n)
    lx = 2.0 * jnp.pi * jnp.where(idx <= (n - 1) // 2, idx, idx - n) \
        / (n * pix)
    ly = 2.0 * jnp.pi * jnp.arange(nz) / (n * pix)
    lxg = jnp.broadcast_to(lx[:, None], (n, nz))
    lyg = jnp.broadcast_to(ly[None, :], (n, nz))
    l2 = jnp.maximum(lxg ** 2 + lyg ** 2, 1e-30)
    c2 = (lxg ** 2 - lyg ** 2) / l2          # cos(2 phi_l)
    s2 = 2.0 * lxg * lyg / l2                # sin(2 phi_l)

    e_re = c2 * g1.real + s2 * g2.real
    e_im = c2 * g1.imag + s2 * g2.imag
    b_re = -s2 * g1.real + c2 * g2.real
    b_im = -s2 * g1.imag + c2 * g2.imag
    norm = pix ** 4 / (fov * fov)
    see = (e_re ** 2 + e_im ** 2) * norm
    sbb = (b_re ** 2 + b_im ** 2) * norm
    seb = (e_re * b_re + e_im * b_im) * norm

    lmag = jnp.sqrt(lxg ** 2 + lyg ** 2)
    mult = jnp.full((nz,), 2.0).at[0].set(1.0)
    if n % 2 == 0:
        mult = mult.at[nz - 1].set(1.0)
    mult = jnp.broadcast_to(mult[None, :], (n, nz))
    l_lo = (2.0 * jnp.pi / fov) if ell_min is None else ell_min
    l_hi = (jnp.sqrt(2.0) * jnp.pi * n / fov) * (1 + 1e-6) \
        if ell_max is None else ell_max
    bin_idx = _bin_index(lmag.ravel(), l_lo, l_hi, num_bins,
                         log_bins=log_bins)
    valid = (bin_idx >= 0) & (bin_idx < num_bins) & (lmag.ravel() > 0)
    bin_idx = jnp.where(valid, bin_idx, num_bins)
    wts = jnp.where(valid, mult.ravel(), 0.0)
    esum, bsum, xsum, lsum, counts = _bin_reduce(
        jnp.stack([wts * see.ravel(), wts * sbb.ravel(),
                   wts * seb.ravel(), wts * lmag.ravel(), wts]),
        bin_idx, num_bins)
    safe = jnp.maximum(counts, 1e-30)
    return (lsum / safe, esum / safe, bsum / safe, xsum / safe, counts)


def redshift_space_positions(positions, velocities, box_size, *,
                             scale_factor, hubble_internal_rate,
                             axis: int = 2):
    """Map real-space positions to redshift space along a line-of-sight
    axis: s = x + v_los / (a H) (plane-parallel approximation), periodic
    wrap. `hubble_internal_rate` = H(a) in internal 1/time units; the
    velocity convention matches the integrator's dx/dt variable.

    (The reference declares compute_redshift_space_power_spectrum and
    never implements it, power_spectrum.hpp:62-66.)"""
    s = positions.at[:, axis].add(
        velocities[:, axis] / (scale_factor * hubble_internal_rate))
    return jnp.mod(s, box_size)


@partial(jax.jit, static_argnames=("ng", "num_bins", "assignment", "axis"))
def power_spectrum_multipoles(positions, box_size, *, ng: int = 128,
                              weights=None, num_bins: int = 32,
                              assignment: str = "cic", axis: int = 2):
    """P_l(k) for l = 0, 2, 4 via Legendre-weighted binning in
    mu = k_los/|k| (declared-only in the reference,
    power_spectrum.hpp:68-74). Returns (k [B], P_l [3, B], counts [B])."""
    grid = DEPOSITS[assignment](positions, ng, box_size, weights)
    delta = density_contrast(grid)
    volume = box_size ** 3
    dk = _rfftn(delta)
    dk = dk / assignment_window(ng, box_size, assignment)
    pk3d = (dk.real ** 2 + dk.imag ** 2) * (volume / float(ng) ** 6)

    kx, ky, kz, k2 = fourier_grid(ng, box_size)
    kmag = jnp.sqrt(k2)
    k_los = jnp.broadcast_to((kx, ky, kz)[axis], pk3d.shape)
    mu2 = jnp.where(k2 > 0, (k_los ** 2) / jnp.where(k2 > 0, k2, 1.0), 0.0)
    leg2 = 0.5 * (3.0 * mu2 - 1.0)
    leg4 = 0.125 * (35.0 * mu2 * mu2 - 30.0 * mu2 + 3.0)
    mult = _hermitian_multiplicity(ng)

    kf = 2.0 * jnp.pi / box_size
    knyq = jnp.pi * ng / box_size
    bin_idx = _bin_index(kmag.ravel(), kf, knyq, num_bins)
    valid = (bin_idx >= 0) & (bin_idx < num_bins) & (kmag.ravel() > 0)
    bin_idx = jnp.where(valid, bin_idx, num_bins)
    wts = jnp.where(valid, mult.ravel(), 0.0)
    s0, s2, s4, ksum, counts = _bin_reduce(
        jnp.stack([wts * pk3d.ravel(), wts * (pk3d * leg2).ravel(),
                   wts * (pk3d * leg4).ravel(), wts * kmag.ravel(), wts]),
        bin_idx, num_bins)
    safe = jnp.maximum(counts, 1e-30)
    p0 = s0 / safe
    p2 = 5.0 * s2 / safe
    p4 = 9.0 * s4 / safe
    k_avg = ksum / safe
    return k_avg, jnp.stack([p0, p2, p4]), counts


def sigma8_from_power(data: PowerSpectrumData):
    """sigma8 from binned P(k) via top-hat integral (reference:
    compute_sigma8, power_spectrum.cu:318-332)."""
    from ..physics.power_spectra import _tophat_window
    k, p, c = data.k, data.power, data.counts
    good = c > 0
    w = _tophat_window(k * 8.0)
    integrand = jnp.where(good, k ** 2 * p * w * w, 0.0)
    # trapezoid over the (irregular) bin centers
    dk = jnp.diff(k)
    tr = 0.5 * (integrand[1:] + integrand[:-1]) * dk
    s2 = jnp.sum(jnp.where(good[1:] & good[:-1], tr, 0.0)) / (
        2.0 * jnp.pi ** 2)
    return jnp.sqrt(jnp.maximum(s2, 0.0))


def save_power_spectrum(path: str, data: PowerSpectrumData) -> None:
    """ASCII dump (reference: save_to_file, power_spectrum.cu:301-316)."""
    import numpy as np
    k = np.asarray(data.k)
    p = np.asarray(data.power)
    c = np.asarray(data.counts)
    with open(path, "w") as f:
        f.write("# k[h/Mpc]  P(k)[(Mpc/h)^3]  modes\n")
        f.write(f"# shot_noise = {float(data.shot_noise):.6e}\n")
        for i in range(k.shape[0]):
            if c[i] > 0:
                f.write(f"{k[i]:.6e} {p[i]:.6e} {c[i]:.0f}\n")
