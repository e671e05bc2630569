"""Angular power spectrum (flat-sky C_ell) estimator tests.

Validates analysis.power_spectrum.angular_power_spectrum against
closed-form expectations: Parseval closure, white-noise flatness, a
single-mode delta, and the cross-spectrum identity C_ab(a=b) = C_aa.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.analysis.power_spectrum import angular_power_spectrum


def test_parseval_closure():
    n, fov = 64, 0.1
    m = jax.random.normal(jax.random.PRNGKey(0), (n, n))
    m = m - jnp.mean(m)
    ell, cl, counts = angular_power_spectrum(m, fov, num_bins=16)
    # Parseval: sum_k |DFT|^2 = n^4 mean(m^2); the estimator's binned
    # total is sum (pix^4 |DFT|^2 / Omega) with pix^4 n^4 = fov^4, so
    # mean(m^2) = total / fov^2 (DC excluded by the zero-mean map; the
    # default ell range covers every other mode)
    total = float(jnp.sum(cl * counts))
    mean_sq = total / (fov * fov)
    assert np.isclose(mean_sq, float(jnp.mean(m ** 2)), rtol=1e-4), \
        (mean_sq, float(jnp.mean(m ** 2)))


def test_white_noise_is_flat():
    n, fov = 128, 0.05
    sigma = 1.7
    m = sigma * jax.random.normal(jax.random.PRNGKey(1), (n, n))
    m = m - jnp.mean(m)
    ell, cl, counts = angular_power_spectrum(m, fov, num_bins=12)
    # white noise: C_ell = sigma^2 * pix_area, flat in ell
    expect = sigma ** 2 * (fov / n) ** 2
    ok = np.asarray(counts) > 100
    ratio = np.asarray(cl)[ok] / expect
    # per-bin chi2 scatter ~ 1/sqrt(counts)
    tol = 5.0 / np.sqrt(np.asarray(counts)[ok])
    assert np.all(np.abs(ratio - 1.0) < np.maximum(tol, 0.05)), ratio


def test_single_mode_lands_in_right_bin():
    n, fov = 64, 0.2
    mx = 6                                  # mode number along x
    ell0 = 2.0 * np.pi * mx / fov
    x = (jnp.arange(n) + 0.0) * (fov / n)
    m = jnp.cos(2.0 * jnp.pi * mx * x / fov)[:, None] \
        * jnp.ones((1, n))
    ell, cl, counts = angular_power_spectrum(
        m, fov, num_bins=24, log_bins=False)
    power = np.asarray(cl) * np.asarray(counts)
    peak = int(np.argmax(power))
    # the peak bin contains ell0
    lo_edge = 2.0 * np.pi / fov
    hi_edge = np.sqrt(2.0) * np.pi * n / fov * (1 + 1e-6)
    width = (hi_edge - lo_edge) / 24
    assert lo_edge + peak * width <= ell0 <= lo_edge + (peak + 1) * width
    # total power: the cosine carries variance 1/2 (Parseval, as above)
    total = float(np.sum(power))
    mean_sq = total / (fov * fov)
    assert np.isclose(mean_sq, 0.5, rtol=1e-4), mean_sq
    # and nothing significant outside the peak bin
    rest = total - float(power[peak])
    assert rest < 1e-6 * total


def test_cross_spectrum_identity_and_symmetry():
    n, fov = 64, 0.1
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (n, n))
    b = a + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (n, n))
    _, c_aa, _ = angular_power_spectrum(a, fov, num_bins=10)
    _, c_ab, _ = angular_power_spectrum(a, fov, b, num_bins=10)
    _, c_ba, _ = angular_power_spectrum(b, fov, a, num_bins=10)
    _, c_aa2, _ = angular_power_spectrum(a, fov, a, num_bins=10)
    np.testing.assert_allclose(np.asarray(c_aa), np.asarray(c_aa2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_ab), np.asarray(c_ba),
                               rtol=1e-5)
    # correlated part dominates: 0 < C_ab < sqrt(C_aa C_bb) (Cauchy-
    # Schwarz holds per mode, binned average can fluctuate -- loose)
    assert np.all(np.asarray(c_ab) > 0)


def test_shear_eb_identity_from_scalar_potential():
    """gamma derived from a scalar kappa must be pure E with
    C_EE = C_kappakappa and C_BB = 0 (flat-sky identity)."""
    from lambda_cdm_tpu.analysis.power_spectrum import shear_eb_spectra
    from lambda_cdm_tpu.raytracing.lensing import second_derivs_from_kappa

    n, fov = 128, 0.1
    kappa = jax.random.normal(jax.random.PRNGKey(5), (n, n))
    kappa = kappa - jnp.mean(kappa)
    uxx, uxy, uyy = second_derivs_from_kappa(kappa, fov, ng=n)
    gamma1 = 0.5 * (uxx - uyy)
    gamma2 = uxy
    # consistency of the Poisson round-trip itself
    np.testing.assert_allclose(np.asarray(0.5 * (uxx + uyy)),
                               np.asarray(kappa), atol=1e-4)

    # stay below the axis Nyquist: those modes' angles are sign-
    # ambiguous under the real FFT (see shear_eb_spectra docstring)
    lmax = 0.95 * np.pi * n / fov
    ell, cee, cbb, ceb, counts = shear_eb_spectra(
        gamma1, gamma2, fov, num_bins=12, ell_max=lmax)
    _, ckk, _ = angular_power_spectrum(kappa, fov, num_bins=12,
                                       ell_max=lmax)
    ok = np.asarray(counts) > 0
    np.testing.assert_allclose(np.asarray(cee)[ok], np.asarray(ckk)[ok],
                               rtol=1e-4)
    assert np.all(np.asarray(cbb)[ok] < 1e-8 * np.asarray(cee)[ok])
    assert np.all(np.abs(np.asarray(ceb)[ok])
                  < 1e-4 * np.asarray(cee)[ok])
