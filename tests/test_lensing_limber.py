"""Absolute-normalization validation of the lensing pipeline against
Limber theory.

Lens planes are DRAWN from the linear matter power spectrum (each
plane's projected overdensity is a Gaussian field with 2D spectrum
P_2D(q) = P_lin(q, z_l)/d_chi), traced with the production multi-plane
tracer, and the measured flat-sky C_ell of the kappa map must match
limber_convergence_cl evaluated with the SAME discretized kernel.
This closes the chain [kernel prefactor x d_chi weighting x a(chi)
factors x tracer sampling x C_ell estimator normalization] with no
free constants — the round-3 h^2 kernel-unit bug (lensing_efficiency
used per-Mpc H0/c against Mpc/h distances, kappa ~2.2x low) is exactly
the class of error this catches: a wrong unit shifts the band ratio by
h^-2 ~ 2.2, far outside the tolerance.

Also validates limber_convergence_cl itself (smoothness, positivity,
source-distance monotonicity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis.power_spectrum import angular_power_spectrum
from lambda_cdm_tpu.physics.cosmology import (CosmologyParams,
                                              comoving_distance,
                                              scale_factor_at_chi)
from lambda_cdm_tpu.physics.power_spectra import linear_power
from lambda_cdm_tpu.raytracing import lensing as lz

PARAMS = CosmologyParams()


def _gaussian_plane(key, ng, box, p2d_fn):
    """Real [ng, ng] Gaussian field with continuum 2D power p2d_fn(q)
    (q in h/Mpc, power in (Mpc/h)^2) over a box x box (Mpc/h) patch."""
    qx = 2.0 * jnp.pi * jnp.fft.fftfreq(ng, d=box / ng)
    qy = 2.0 * jnp.pi * jnp.fft.rfftfreq(ng, d=box / ng)
    q = jnp.sqrt(qx[:, None] ** 2 + qy[None, :] ** 2)
    amp = jnp.where(q > 0, jnp.sqrt(p2d_fn(jnp.maximum(q, 1e-8))), 0.0)
    white = jax.random.normal(key, (ng, ng))
    return jnp.fft.irfftn(jnp.fft.rfftn(white) * amp * (ng / box),
                          s=(ng, ng))


@pytest.mark.slow      # 3 traced realizations, ~45 s on one core
def test_traced_cl_matches_limber():
    ng, box = 256, 300.0           # Mpc/h plane patches
    n_planes = 8
    chis = jnp.linspace(600.0, 2000.0, n_planes)      # Mpc/h
    d_chi = float(chis[1] - chis[0])
    a_l = scale_factor_at_chi(PARAMS, chis / PARAMS.h)
    z_l = 1.0 / a_l - 1.0
    chi_s = 2330.0                 # ~ chi(z=1) in Mpc/h

    fov = 0.15                     # radians
    n_side = 128
    ang = (jnp.arange(n_side) + 0.5) * fov / n_side
    theta0 = jnp.stack(jnp.meshgrid(ang, ang, indexing="ij"),
                       -1).reshape(-1, 2)

    # band limited by the nearest plane's resolvable q (bilinear
    # smoothing <~5% below a quarter of the plane Nyquist)
    q_nyq = np.pi * ng / box
    ell_max = 0.25 * q_nyq * float(chis[0])
    ell_min = 3.0 * 2.0 * np.pi / fov
    num_bins = 4

    n_real = 3
    cl_sum = None
    for r in range(n_real):
        keys = jax.random.split(jax.random.PRNGKey(100 + r), n_planes)
        planes = jnp.stack([
            _gaussian_plane(
                keys[l], ng, box,
                lambda q, zl=float(z_l[l]): linear_power(
                    PARAMS, q, z=zl) / d_chi)
            for l in range(n_planes)])
        b = lz.trace_rays(PARAMS, planes, chis, a_l, d_chi, box, theta0,
                          chi_s, ng=ng)
        kappa = b.kappa.reshape(n_side, n_side)
        _, cl, counts = angular_power_spectrum(
            kappa, fov, num_bins=num_bins, ell_min=ell_min,
            ell_max=ell_max)
        cl_sum = cl if cl_sum is None else cl_sum + cl
    cl_meas = np.asarray(cl_sum) / n_real
    counts = np.asarray(counts)

    ell, _, _ = angular_power_spectrum(
        kappa, fov, num_bins=num_bins, ell_min=ell_min, ell_max=ell_max)
    ell = np.asarray(ell)

    # theory with the SAME plane discretization (midpoint sum over the
    # 8 planes, not the continuous integral: removes the discretization
    # difference from the comparison)
    w = lz.lensing_efficiency(PARAMS, chis, chi_s, a_l)
    k_grid = (jnp.asarray(ell)[:, None] + 0.5) / chis[None, :]
    p = linear_power(PARAMS, k_grid, z=z_l[None, :])
    cl_theory = np.asarray(
        jnp.sum((w / chis)[None, :] ** 2 * p, axis=1) * d_chi)

    ratio = cl_meas / cl_theory
    # per-bin: Gaussian sample variance of the 3-realization average
    sig = np.sqrt(2.0 / np.maximum(counts * n_real, 1.0))
    assert np.all(np.abs(ratio - 1.0) < np.maximum(5.0 * sig, 0.35)), \
        (ell, ratio, sig)
    band = float(np.exp(np.mean(np.log(ratio))))
    assert abs(band - 1.0) < 0.15, \
        f"band ratio {band:.3f} (h^2 unit bug would sit at ~0.45 or " \
        f"~2.2): ell={ell}, ratio={ratio}"

    # and the continuous Limber function agrees with the discretized
    # sum at the few-percent-per-coarseness level
    cl_cont = np.asarray(lz.limber_convergence_cl(
        PARAMS, jnp.asarray(ell), 1.0))
    # different chi weighting (full [0, chi_s] vs 8 slabs ending at
    # 2000): agreement to ~25% is the honest expectation
    r2 = cl_cont / cl_theory
    assert np.all((r2 > 0.6) & (r2 < 1.6)), (ell, r2)


def test_limber_cl_shape_and_monotonicity():
    ells = jnp.asarray([50.0, 100.0, 200.0, 400.0, 800.0])
    cl1 = np.asarray(lz.limber_convergence_cl(PARAMS, ells, 1.0))
    cl2 = np.asarray(lz.limber_convergence_cl(PARAMS, ells, 2.0))
    assert np.all(cl1 > 0) and np.all(np.isfinite(cl1))
    # more path length + higher efficiency: deeper sources lens more
    assert np.all(cl2 > cl1)
    # ell^2 C_ell rises then the linear spectrum turns it over ->
    # C_ell itself decreases with ell over this range
    assert np.all(np.diff(cl1) < 0)
