"""Tests for transfer functions, sigma(R), and the normalized linear P(k)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.physics import power_spectra as ps
from lambda_cdm_tpu.physics.cosmology import CosmologyParams


@pytest.fixture(scope="module")
def params():
    return CosmologyParams()


class TestTransferFunctions:
    def test_large_scale_limit_unity(self, params):
        # T(k) -> 1 as k -> 0
        for fn in (ps.bbks_transfer, ps.eh98_transfer,
                   ps.eh98_nowiggle_transfer):
            assert float(fn(params, 1e-5)) == pytest.approx(1.0, abs=0.02)

    def test_small_scale_suppression(self, params):
        for fn in (ps.bbks_transfer, ps.eh98_transfer,
                   ps.eh98_nowiggle_transfer):
            t = float(fn(params, 10.0))
            assert 0 < t < 1e-2

    def test_monotone_decreasing_nowiggle(self, params):
        k = jnp.logspace(-4, 1.5, 200)
        t = np.asarray(ps.eh98_nowiggle_transfer(params, k))
        assert np.all(np.diff(t) < 0)

    def test_eh98_has_bao_wiggles(self, params):
        """Full EH98 minus no-wiggle shows oscillations around k~0.05-0.3."""
        k = jnp.logspace(jnp.log10(0.03), jnp.log10(0.4), 400)
        ratio = np.asarray(ps.eh98_transfer(params, k)
                           / ps.eh98_nowiggle_transfer(params, k))
        # the ratio crosses 1 multiple times (acoustic oscillations)
        crossings = np.sum(np.diff(np.sign(ratio - np.mean(ratio))) != 0)
        assert crossings >= 3

    def test_eh98_close_to_nowiggle_overall(self, params):
        k = jnp.logspace(-3, 1, 100)
        full = np.asarray(ps.eh98_transfer(params, k))
        nw = np.asarray(ps.eh98_nowiggle_transfer(params, k))
        np.testing.assert_allclose(full, nw, rtol=0.12)


class TestSigmaAndNormalization:
    def test_sigma8_normalization_self_consistent(self, params):
        s8 = float(ps.sigma_r(params, 8.0))
        assert s8 == pytest.approx(float(params.sigma8), rel=1e-4)

    def test_sigma_decreases_with_r(self, params):
        r = jnp.array([1.0, 4.0, 8.0, 16.0, 32.0])
        s = np.asarray(ps.sigma_r(params, r))
        assert np.all(np.diff(s) < 0)

    def test_sigma8_bbks_normalization(self, params):
        s8 = float(ps.sigma_r(params, 8.0, transfer=ps.bbks_transfer))
        assert s8 == pytest.approx(float(params.sigma8), rel=1e-4)


class TestLinearPower:
    def test_peak_location(self, params):
        # LCDM P(k) peaks near k_eq ~ 0.01-0.02 h/Mpc
        k = jnp.logspace(-4, 1, 500)
        p = np.asarray(ps.linear_power(params, k))
        k_peak = float(k[np.argmax(p)])
        assert 0.005 < k_peak < 0.05

    def test_growth_scaling_with_redshift(self, params):
        from lambda_cdm_tpu.physics.cosmology import growth_factor
        k = 0.1
        p0 = float(ps.linear_power(params, k, z=0.0))
        p49 = float(ps.linear_power(params, k, z=49.0))
        d = float(growth_factor(params, 1.0 / 50.0))
        assert p49 / p0 == pytest.approx(d * d, rel=1e-5)

    def test_large_scale_primordial_slope(self, params):
        # P(k) ~ k^ns for k << k_eq
        k1, k2 = 1e-4, 2e-4
        p1 = float(ps.linear_power(params, k1))
        p2 = float(ps.linear_power(params, k2))
        slope = np.log(p2 / p1) / np.log(k2 / k1)
        assert slope == pytest.approx(0.965, abs=0.03)

    def test_reasonable_amplitude(self, params):
        # P(k=0.1) should be O(10^3-10^4) (Mpc/h)^3 for Planck params
        p = float(ps.linear_power(params, 0.1))
        assert 1e3 < p < 3e4
