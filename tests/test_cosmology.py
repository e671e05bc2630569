"""Unit tests for background cosmology vs analytic / known LCDM values.

Test strategy per SURVEY.md section 4: the reference has no tests; its
cosmology_test example prints tables for eyeball comparison
(examples/cosmology_test.cpp:27-113). Here those golden values become
assertions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.physics import cosmology as cos
from lambda_cdm_tpu.physics.cosmology import CosmologyParams


@pytest.fixture(scope="module")
def params():
    return CosmologyParams()  # omega_m=0.31, omega_lambda=0.69, h=0.67


class TestFriedmann:
    def test_e_function_today(self, params):
        assert float(cos.e_function(params, 1.0)) == pytest.approx(1.0, abs=1e-6)

    def test_e_function_matter_era(self, params):
        # deep matter domination: E^2 ~ Omega_m a^-3
        a = 0.01
        e2 = float(cos.e2_function(params, a))
        assert e2 == pytest.approx(0.31 * a ** -3, rel=1e-3)

    def test_hubble_today(self, params):
        assert float(cos.hubble(params, 1.0)) == pytest.approx(67.0, rel=1e-6)

    def test_hubble_increases_with_z(self, params):
        z = jnp.array([0.0, 0.5, 1.0, 2.0, 5.0])
        h = np.asarray(cos.hubble_z(params, z))
        assert np.all(np.diff(h) > 0)

    def test_omega_budget_at_all_epochs(self, params):
        # Omega_m(a) + Omega_lambda(a) = 1 for flat LCDM (no radiation)
        for a in (0.1, 0.5, 1.0):
            total = float(cos.omega_m_a(params, a)
                          + cos.omega_lambda_a(params, a))
            assert total == pytest.approx(1.0, abs=1e-6)

    def test_matter_dominates_early(self, params):
        assert float(cos.omega_m_a(params, 0.02)) > 0.999

    def test_validate_rejects_non_flat(self):
        with pytest.raises(ValueError):
            CosmologyParams(omega_m=0.5, omega_lambda=0.69).validate()

    def test_wcdm_reduces_to_lcdm(self, params):
        w = CosmologyParams(w0=-1.0, wa=0.0)
        a = jnp.array([0.3, 0.7, 1.0])
        np.testing.assert_allclose(np.asarray(cos.e_function(w, a)),
                                   np.asarray(cos.e_function(params, a)),
                                   rtol=1e-6)


class TestGrowth:
    def test_normalization(self, params):
        assert float(cos.growth_factor(params, 1.0)) == pytest.approx(1.0)

    def test_matter_era_growth_linear_in_a(self, params):
        # D(a) ~ a in matter domination
        d1 = float(cos.growth_factor(params, 0.01))
        d2 = float(cos.growth_factor(params, 0.02))
        assert d2 / d1 == pytest.approx(2.0, rel=0.02)

    def test_growth_suppressed_today(self, params):
        # Lambda suppresses growth: D(0.5) > 0.5 * D(1)/1
        assert float(cos.growth_factor(params, 0.5)) > 0.5

    def test_growth_rate_today_planck(self, params):
        # f(z=0) ~ Omega_m^0.55 ~ 0.525 for Omega_m=0.31
        assert float(cos.growth_rate(params, 1.0)) == pytest.approx(
            0.31 ** 0.55, rel=1e-5)

    def test_exact_growth_matches_cpt92_percent_level(self, params):
        a = jnp.array([0.1, 0.25, 0.5, 0.8, 1.0])
        d_approx = np.asarray(cos.growth_factor(params, a))
        d_exact = np.asarray(cos.growth_factor_exact(params, a))
        np.testing.assert_allclose(d_exact, d_approx, rtol=0.02)

    def test_exact_growth_normalized(self, params):
        assert float(cos.growth_factor_exact(params, 1.0)) == pytest.approx(
            1.0, abs=1e-4)


class TestDistancesAndTimes:
    def test_comoving_distance_small_z_hubble_law(self, params):
        # D_C(z) -> (c/H0) z as z -> 0
        z = 0.01
        d = float(cos.comoving_distance(params, z))
        assert d == pytest.approx(cos.C_KM_S / 67.0 * z, rel=0.01)

    def test_comoving_distance_z1_known_value(self, params):
        # For Planck-ish params, D_C(z=1) ~ 3400 Mpc (physical Mpc, h=0.67)
        d = float(cos.comoving_distance(params, 1.0))
        assert 3200 < d < 3600

    def test_distance_relations_flat(self, params):
        z = 1.5
        d_c = float(cos.comoving_distance(params, z))
        d_a = float(cos.angular_diameter_distance(params, z))
        d_l = float(cos.luminosity_distance(params, z))
        assert d_a == pytest.approx(d_c / (1 + z), rel=1e-5)
        assert d_l == pytest.approx(d_c * (1 + z), rel=1e-5)
        # Etherington reciprocity
        assert d_l == pytest.approx(d_a * (1 + z) ** 2, rel=1e-5)

    def test_age_of_universe(self, params):
        # Planck 2018: ~13.8 Gyr
        age = float(cos.age_of_universe(params))
        assert 13.3 < age < 14.3

    def test_cosmic_time_monotonic(self, params):
        t1 = float(cos.cosmic_time(params, 0.5))
        t2 = float(cos.cosmic_time(params, 1.0))
        assert 0 < t1 < t2

    def test_lookback_plus_age_consistency(self, params):
        z = 2.0
        lb = float(cos.lookback_time(params, z))
        t_then = float(cos.cosmic_time(params, 1 / (1 + z)))
        age = float(cos.age_of_universe(params))
        assert lb + t_then == pytest.approx(age, rel=1e-4)

    def test_redshift_scale_factor_roundtrip(self):
        z = jnp.array([0.0, 1.0, 49.0])
        a = cos.redshift_to_scale_factor(z)
        np.testing.assert_allclose(
            np.asarray(cos.scale_factor_to_redshift(a)), np.asarray(z),
            rtol=1e-6)


class TestCurvedCosmologies:
    def test_open_universe_distance_larger(self):
        flat = CosmologyParams()
        open_u = CosmologyParams(omega_m=0.31, omega_lambda=0.59,
                                 omega_k=0.10)
        d_flat = float(cos.transverse_comoving_distance(flat, 2.0))
        d_open = float(cos.transverse_comoving_distance(open_u, 2.0))
        # sinh amplification in open universes
        d_open_los = float(cos.comoving_distance(open_u, 2.0))
        assert d_open > d_open_los
        assert d_flat != d_open

    def test_closed_universe_sin_suppression(self):
        closed = CosmologyParams(omega_m=0.36, omega_lambda=0.69,
                                 omega_k=-0.05)
        d_m = float(cos.transverse_comoving_distance(closed, 2.0))
        d_c = float(cos.comoving_distance(closed, 2.0))
        assert d_m < d_c
