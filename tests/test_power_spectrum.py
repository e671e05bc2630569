"""Power-spectrum analyzer tests: deposit conservation, known-amplitude
sine-wave oracle, shot noise of a Poisson field, window deconvolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis import power_spectrum as psa


class TestDeposits:
    @pytest.mark.parametrize("assignment", ["ngp", "cic", "tsc"])
    def test_mass_conservation(self, assignment):
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (1000, 3), maxval=32.0)
        grid = psa.DEPOSITS[assignment](pos, 16, 32.0)
        assert float(jnp.sum(grid)) == pytest.approx(1000.0, rel=1e-4)

    def test_cic_single_particle_at_cell_center(self):
        # particle exactly at a cell center -> all mass in that cell
        ng, box = 8, 8.0
        pos = jnp.array([[2.5, 3.5, 4.5]])  # center of cell (2,3,4)
        grid = psa.cic_deposit(pos, ng, box)
        assert float(grid[2, 3, 4]) == pytest.approx(1.0, abs=1e-6)

    def test_cic_straddles_cells(self):
        ng, box = 8, 8.0
        pos = jnp.array([[3.0, 3.5, 4.5]])  # on x-boundary between 2 and 3
        grid = psa.cic_deposit(pos, ng, box)
        assert float(grid[2, 3, 4]) == pytest.approx(0.5, abs=1e-6)
        assert float(grid[3, 3, 4]) == pytest.approx(0.5, abs=1e-6)

    def test_periodic_wrap(self):
        ng, box = 8, 8.0
        pos = jnp.array([[0.1, 0.5, 0.5]])  # near x=0 face
        grid = psa.cic_deposit(pos, ng, box)
        # some weight wraps to the ng-1 plane
        assert float(jnp.sum(grid[ng - 1])) > 0
        assert float(jnp.sum(grid)) == pytest.approx(1.0, rel=1e-5)

    def test_density_contrast_zero_mean(self):
        key = jax.random.PRNGKey(1)
        pos = jax.random.uniform(key, (5000, 3), maxval=16.0)
        delta = psa.density_contrast(psa.cic_deposit(pos, 16, 16.0))
        assert abs(float(jnp.mean(delta))) < 1e-5


class TestPowerOracle:
    def test_single_mode_amplitude(self):
        """delta(x) = A cos(k1 x) has P(k1) = A^2 V / 2 exactly."""
        ng, box, amp = 32, 100.0, 0.05
        x = (jnp.arange(ng) + 0.5) * (box / ng)
        k1 = 2.0 * jnp.pi / box * 4  # 4th harmonic
        delta = amp * jnp.cos(k1 * x)[:, None, None] * jnp.ones((1, ng, ng))
        data = psa.power_from_delta(delta, ng=ng, box_size=box,
                                    num_particles=10 ** 9, num_bins=24,
                                    deconvolve=False, log_bins=False)
        # delta_k = A/2 at +-k1 -> P = A^2 V/4 per mode; the rfftn layout
        # stores both (kz=0 plane), so the multiplicity-weighted bin total
        # is A^2 V / 2  (consistent with <delta^2> = A^2/2)
        expected_total = amp ** 2 * box ** 3 / 2.0
        k = np.asarray(data.k)
        p = np.asarray(data.power_raw)
        c = np.asarray(data.counts)
        i = np.argmin(np.abs(k - float(k1)))
        assert c[i] > 0
        total_power_in_bin = p[i] * c[i]
        assert total_power_in_bin == pytest.approx(expected_total, rel=1e-3)

    def test_poisson_shot_noise(self):
        """Random points: P_raw(k) ~ V/N at all k; subtraction nulls it."""
        key = jax.random.PRNGKey(3)
        n, ng, box = 20000, 32, 50.0
        pos = jax.random.uniform(key, (n, 3), maxval=box)
        data = psa.measure_power_spectrum(pos, box, ng=ng, num_bins=12,
                                          subtract_shot_noise=False)
        shot = box ** 3 / n
        k = np.asarray(data.k)
        p = np.asarray(data.power)   # raw (no subtraction)
        c = np.asarray(data.counts)
        sel = (c > 50) & (k < 0.5 * np.pi * ng / box)  # avoid nyquist noise
        assert np.allclose(p[sel], shot, rtol=0.5)
        mean_ratio = np.mean(p[sel]) / shot
        assert mean_ratio == pytest.approx(1.0, abs=0.2)

    def test_shot_noise_value(self):
        key = jax.random.PRNGKey(4)
        pos = jax.random.uniform(key, (1000, 3), maxval=10.0)
        data = psa.measure_power_spectrum(pos, 10.0, ng=16)
        assert float(data.shot_noise) == pytest.approx(1.0, rel=1e-5)

    def test_cross_spectrum_self_equals_auto(self):
        key = jax.random.PRNGKey(5)
        pos = jax.random.uniform(key, (4000, 3), maxval=25.0)
        auto = psa.measure_power_spectrum(pos, 25.0, ng=32, num_bins=16,
                                          subtract_shot_noise=False)
        k, px, c = psa.cross_power_spectrum(pos, pos, 25.0, ng=32,
                                            num_bins=16)
        sel = np.asarray(auto.counts) > 0
        np.testing.assert_allclose(np.asarray(px)[sel],
                                   np.asarray(auto.power)[sel], rtol=1e-4)

    def test_save_ascii(self, tmp_path):
        key = jax.random.PRNGKey(6)
        pos = jax.random.uniform(key, (500, 3), maxval=10.0)
        data = psa.measure_power_spectrum(pos, 10.0, ng=16, num_bins=8)
        p = tmp_path / "pk.txt"
        psa.save_power_spectrum(str(p), data)
        lines = p.read_text().strip().splitlines()
        assert lines[0].startswith("# k")
        assert len(lines) > 3
