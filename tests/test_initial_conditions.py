"""IC generator tests, including the statistical validation the reference
never had: the measured P(k) of generated particles must match the input
linear theory P(k) (SURVEY.md section 7, M2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import CosmologyParams, growth_factor
from lambda_cdm_tpu.physics.power_spectra import linear_power
from lambda_cdm_tpu.analysis.power_spectrum import measure_power_spectrum

pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

PARAMS = CosmologyParams()


class TestGaussianField:
    def test_hermitian_by_construction(self):
        """irfftn(delta_k) must be real with zero imaginary leakage --
        guaranteed because we FFT real white noise."""
        key = jax.random.PRNGKey(0)
        ng, box = 32, 200.0
        dk = ics.gaussian_delta_k(key, ng, box, PARAMS)
        delta = jnp.fft.irfftn(dk, s=(ng, ng, ng))
        assert delta.dtype in (jnp.float32, jnp.float64)
        assert bool(jnp.all(jnp.isfinite(delta)))

    def test_zero_dc_mode(self):
        key = jax.random.PRNGKey(1)
        dk = ics.gaussian_delta_k(key, 16, 100.0, PARAMS)
        assert complex(dk[0, 0, 0]) == 0

    def test_field_power_matches_input(self):
        """Measured P(k) of the raw field == linear P(k) (fixed-amplitude
        mode kills sample variance)."""
        from lambda_cdm_tpu.analysis.power_spectrum import power_from_delta
        key = jax.random.PRNGKey(2)
        ng, box = 64, 500.0
        dk = ics.gaussian_delta_k(key, ng, box, PARAMS,
                                  fixed_amplitude=True)
        delta = jnp.fft.irfftn(dk, s=(ng, ng, ng))
        data = power_from_delta(delta, ng=ng, box_size=box,
                                num_particles=1e12, num_bins=16,
                                deconvolve=False)
        k = np.asarray(data.k)
        p = np.asarray(data.power_raw)
        c = np.asarray(data.counts)
        sel = (c > 20) & (k > 0) & (k < 0.25)
        expect = np.asarray(linear_power(PARAMS, jnp.asarray(k[sel])))
        np.testing.assert_allclose(p[sel], expect, rtol=0.25)


class TestZeldovich:
    def test_particle_pk_matches_linear_theory(self):
        """The headline IC test (BASELINE config #2): particles displaced
        by Zel'dovich from a 64^3 grid reproduce the linear P(k) at z_init
        in the well-sampled k range."""
        key = jax.random.PRNGKey(3)
        ng = 64
        box = 500.0
        a_init = 1.0 / 50.0
        pos, vel = ics.lpt_displacements(
            key, PARAMS, ng=ng, n_side=ng, box_size=box, a_init=a_init,
            use_2lpt=False, fixed_amplitude=True)
        # lattice particle loads are sub-Poissonian: no V/N shot noise to
        # subtract (raw spectrum IS the signal at these k)
        data = measure_power_spectrum(pos, box, ng=ng, num_bins=20,
                                      subtract_shot_noise=False)
        k = np.asarray(data.k)
        p = np.asarray(data.power)
        c = np.asarray(data.counts)
        d = float(growth_factor(PARAMS, a_init))
        sel = (c > 30) & (k > 0.02) & (k < 0.2)
        assert sel.sum() >= 4
        expect = np.asarray(linear_power(PARAMS, jnp.asarray(k[sel]))) * d * d
        np.testing.assert_allclose(p[sel], expect, rtol=0.3)

    def test_displacements_small_at_high_z(self):
        key = jax.random.PRNGKey(4)
        ng, box = 32, 100.0
        pos, vel = ics.lpt_displacements(
            key, PARAMS, ng=ng, n_side=ng, box_size=box, a_init=0.02,
            use_2lpt=False)
        stats = ics.displacement_statistics(pos, box, ng)
        # at z=49 displacements are well below the 3.125 Mpc/h cell size
        assert float(stats["rms_displacement"]) < box / ng
        assert float(stats["rms_displacement"]) > 0

    def test_velocity_displacement_proportionality(self):
        """1LPT: v = H f Psi exactly -> velocity field parallel to
        displacement field."""
        key = jax.random.PRNGKey(5)
        ng, box, a = 16, 100.0, 0.02
        pos, vel = ics.lpt_displacements(
            key, PARAMS, ng=ng, n_side=ng, box_size=box, a_init=a,
            use_2lpt=False)
        q = ics.lattice_positions(ng, box)
        from lambda_cdm_tpu.forces.direct import min_image
        disp = min_image(pos - q, box)
        pref = float(ics.ic_velocity_prefactor(PARAMS, a, 100.0,
                                               "reference"))
        # atol: disp is reconstructed from float32 positions ~ box, so its
        # absolute error floor is box*eps ~ 1e-5, amplified by pref ~ 2e4
        np.testing.assert_allclose(np.asarray(vel), pref * np.asarray(disp),
                                   rtol=1e-3, atol=pref * box * 2e-7)


class Test2LPT:
    def test_2lpt_correction_is_second_order(self):
        """|Psi2| ~ D * |Psi1| << |Psi1| at high z."""
        key = jax.random.PRNGKey(6)
        ng, box, a = 32, 100.0, 0.02
        p1, _ = ics.lpt_displacements(key, PARAMS, ng=ng, n_side=ng,
                                      box_size=box, a_init=a,
                                      use_2lpt=False)
        p2, _ = ics.lpt_displacements(key, PARAMS, ng=ng, n_side=ng,
                                      box_size=box, a_init=a,
                                      use_2lpt=True)
        from lambda_cdm_tpu.forces.direct import min_image
        diff = min_image(p2 - p1, box)
        q = ics.lattice_positions(ng, box)
        d1 = min_image(p1 - q, box)
        rms2 = float(jnp.sqrt(jnp.mean(jnp.sum(diff ** 2, -1))))
        rms1 = float(jnp.sqrt(jnp.mean(jnp.sum(d1 ** 2, -1))))
        assert 0 < rms2 < 0.1 * rms1

    def test_1lpt_2lpt_highly_correlated(self):
        """Same seed -> cross-correlation ~1 (the 2lpt_test harness,
        examples/2lpt_test.cpp:108-144)."""
        key = jax.random.PRNGKey(7)
        ng, box, a = 32, 100.0, 0.02
        p1, _ = ics.lpt_displacements(key, PARAMS, ng=ng, n_side=ng,
                                      box_size=box, a_init=a,
                                      use_2lpt=False)
        p2, _ = ics.lpt_displacements(key, PARAMS, ng=ng, n_side=ng,
                                      box_size=box, a_init=a,
                                      use_2lpt=True)
        from lambda_cdm_tpu.forces.direct import min_image
        q = ics.lattice_positions(ng, box)
        d1 = np.asarray(min_image(p1 - q, box)).ravel()
        d2 = np.asarray(min_image(p2 - q, box)).ravel()
        corr = np.corrcoef(d1, d2)[0, 1]
        assert corr > 0.99

    def test_2lpt_divergence_sign(self):
        """Exact spectral identity i k . Psi2_k = +S_k against a
        hand-computed source: for delta = A (cos kx + cos ky + cos kz),
        S = A^2 (cos kx cos ky + cos kx cos kz + cos ky cos kz). The
        physical term D2*Psi2 (D2 < 0) then has negative divergence at
        the density peak: 2LPT deepens infall (Bouchet+95). Round-1 bug:
        the sign was flipped, pushing particles OUT of overdensities."""
        ng, box, amp, m = 32, 100.0, 0.01, 2
        x = jnp.arange(ng) * (box / ng)
        kmode = 2.0 * jnp.pi * m / box
        cx = jnp.cos(kmode * x)
        delta = amp * (cx[:, None, None] + cx[None, :, None]
                       + cx[None, None, :])
        dk = jnp.fft.rfftn(delta).astype(jnp.complex64)
        psi2 = ics.second_order_displacement(dk, ng, box)
        kx, ky, kz, _ = ics.fourier_grid(ng, box)
        div = sum(jnp.fft.irfftn(1j * kv * jnp.fft.rfftn(psi2[i]),
                                 s=(ng, ng, ng))
                  for i, kv in enumerate((kx, ky, kz)))
        s_analytic = amp ** 2 * (
            cx[:, None, None] * cx[None, :, None]
            + cx[:, None, None] * cx[None, None, :]
            + cx[None, :, None] * cx[None, None, :])
        np.testing.assert_allclose(np.asarray(div), np.asarray(s_analytic),
                                   atol=1e-7)
        # physical term at the peak (origin): D2 * S(0) < 0 => infall
        d2_coeff = -3.0 / 7.0  # sign of D2 (Omega-dependent factor > 0)
        assert d2_coeff * float(s_analytic[0, 0, 0]) < 0

    def test_2lpt_deepens_infall(self):
        """End-to-end: for a smooth overdensity, the 2LPT correction moves
        particles the same way as Zel'dovich (toward the peak), not
        against it — dot(Psi2_phys, Psi1_phys) > 0 where both are
        significant."""
        ng, box, a = 32, 100.0, 0.2
        x = jnp.arange(ng) * (box / ng)
        kmode = 2.0 * jnp.pi / box
        cx = jnp.cos(kmode * x)
        delta = 0.05 * (cx[:, None, None] + cx[None, :, None]
                        + cx[None, None, :])
        dk = jnp.fft.rfftn(delta).astype(jnp.complex64)
        from lambda_cdm_tpu.physics.cosmology import omega_m_a
        d1 = float(growth_factor(PARAMS, a))
        om_a = float(omega_m_a(PARAMS, a))
        d2 = -3.0 / 7.0 * om_a ** (-1.0 / 143.0) * d1 * d1
        psi1 = np.asarray(ics.displacement_from_delta(dk, ng, box)) * d1
        psi2 = np.asarray(ics.second_order_displacement(dk, ng, box)) * d2
        # along the x-axis through the peak: Psi1_x = -d1 A sin(kx)/k and
        # Psi2_x = d2 A^2 sin(kx)/k, so dot = -d1 d2 A^3 sin^2/k^2 > 0
        # (d2 < 0). The round-1 sign bug made this negative.
        dot = psi1[0, 1:ng // 2, 0, 0] * psi2[0, 1:ng // 2, 0, 0]
        assert np.all(dot > 0.0)


class TestGenerateState:
    def _config(self, kind, n=512, ng=8):
        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = 100.0
        cfg.particles.initial_conditions.type = kind
        cfg.particles.initial_conditions.grid_size = ng
        cfg.cosmology.initial_redshift = 49.0
        return cfg

    def test_zeldovich_state(self):
        cfg = self._config("zeldovich", n=512, ng=8)
        st = ics.generate_state(cfg)
        assert st.positions.shape == (512, 3)
        v = ics.validate_initial_conditions(st, 100.0)
        assert all(v[k] for k in ("positions_finite", "velocities_finite",
                                  "in_box", "masses_positive"))
        assert float(st.scale_factor) == pytest.approx(0.02)

    def test_cosmological_mass(self):
        cfg = self._config("grid", n=512)
        st = ics.generate_state(cfg)
        # total mass = rho_crit * Omega_m * V
        total = float(jnp.sum(st.masses))
        assert total == pytest.approx(
            ics.RHO_CRIT * 0.31 * 100.0 ** 3, rel=1e-4)

    def test_uniform_random(self):
        cfg = self._config("uniform_random", n=100)
        st = ics.generate_state(cfg)
        assert st.positions.shape == (100, 3)

    def test_glass_more_uniform_than_random(self):
        from lambda_cdm_tpu.analysis.power_spectrum import cic_deposit
        key = jax.random.PRNGKey(9)
        n, box, ng = 512, 50.0, 8
        glass = ics.glass_positions(key, n, box, iterations=30)
        rand = jax.random.uniform(key, (n, 3), maxval=box)
        var_g = float(jnp.var(cic_deposit(glass, ng, box)))
        var_r = float(jnp.var(cic_deposit(rand, ng, box)))
        assert var_g < var_r

    def test_non_cubic_n_raises(self):
        cfg = self._config("zeldovich", n=100)
        with pytest.raises(ValueError):
            ics.generate_state(cfg)
