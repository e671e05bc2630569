"""Direct force solver tests: analytic two-body oracle, symmetry,
chunked-vs-broadcast equivalence, PBC minimum image.

Pattern per SURVEY.md section 4: direct summation is the oracle for every
approximate solver (the barnes_hut_test harness idea,
examples/barnes_hut_test.cu:148-202).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces import direct as fd


class TestTwoBody:
    def test_analytic_pair(self):
        # two unit masses separated by r: |a| = G m / (r^2 + eps^2)^(3/2) * r
        box, r, eps, g = 100.0, 2.0, 0.1, 1.0
        pos = jnp.array([[10.0, 10.0, 10.0], [10.0 + r, 10.0, 10.0]])
        m = jnp.ones(2)
        acc = fd.direct_accelerations(pos, m, box, eps, g)
        expected = g * r / (r * r + eps * eps) ** 1.5
        assert float(acc[0, 0]) == pytest.approx(expected, rel=1e-5)
        assert float(acc[1, 0]) == pytest.approx(-expected, rel=1e-5)
        # perpendicular components vanish
        np.testing.assert_allclose(np.asarray(acc[:, 1:]), 0.0, atol=1e-7)

    def test_newton_third_law(self):
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(key, (64, 3), maxval=50.0)
        m = jax.random.uniform(jax.random.PRNGKey(1), (64,), minval=0.5,
                               maxval=2.0)
        acc = fd.direct_accelerations(pos, m, 50.0, 0.01)
        # total momentum change = sum m_i a_i = 0
        net = jnp.sum(m[:, None] * acc, axis=0)
        assert float(jnp.max(jnp.abs(net))) < 1e-3 * float(
            jnp.max(jnp.abs(m[:, None] * acc)))

    def test_minimum_image(self):
        # particles near opposite faces attract across the boundary
        box = 10.0
        pos = jnp.array([[0.5, 5.0, 5.0], [9.5, 5.0, 5.0]])
        m = jnp.ones(2)
        acc = fd.direct_accelerations(pos, m, box, 0.01)
        # separation through the boundary is 1.0 (not 9.0): particle 0 is
        # pulled in -x (toward the boundary)
        assert float(acc[0, 0]) < 0
        assert float(acc[1, 0]) > 0
        expected = 1.0 / (1.0 + 0.01 ** 2) ** 1.5
        assert abs(float(acc[0, 0])) == pytest.approx(expected, rel=1e-4)


class TestChunkedEquivalence:
    @pytest.mark.parametrize("n,chunk", [(100, 32), (257, 64), (512, 512)])
    def test_matches_broadcast(self, n, chunk):
        key = jax.random.PRNGKey(n)
        pos = jax.random.uniform(key, (n, 3), maxval=20.0)
        m = jax.random.uniform(jax.random.PRNGKey(n + 1), (n,), minval=0.1,
                               maxval=3.0)
        ref = fd.direct_accelerations(pos, m, 20.0, 0.05)
        chk = fd.direct_accelerations_chunked(pos, m, 20.0, 0.05,
                                              chunk_size=chunk)
        np.testing.assert_allclose(np.asarray(chk), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

    def test_float64_oracle_agreement(self):
        """fp32 result within 1e-3 of the fp64 oracle (BASELINE fidelity)."""
        jax.config.update("jax_enable_x64", True)
        try:
            key = jax.random.PRNGKey(7)
            pos64 = jax.random.uniform(key, (256, 3), maxval=10.0,
                                       dtype=jnp.float64)
            m64 = jnp.ones(256, jnp.float64)
            ref = fd.direct_accelerations(pos64, m64, 10.0, 0.05)
            out = fd.direct_accelerations(pos64.astype(jnp.float32),
                                          m64.astype(jnp.float32), 10.0, 0.05)
            scale = float(jnp.max(jnp.abs(ref)))
            err = float(jnp.max(jnp.abs(out.astype(jnp.float64) - ref)))
            assert err / scale < 1e-3
        finally:
            jax.config.update("jax_enable_x64", False)


class TestEnergies:
    def test_two_body_potential(self):
        box, r, eps = 100.0, 3.0, 0.0
        pos = jnp.array([[1.0, 1.0, 1.0], [4.0, 1.0, 1.0]])
        m = jnp.array([2.0, 3.0])
        pe = fd.potential_energy(pos, m, box, softening=1e-6)
        assert float(pe) == pytest.approx(-2.0 * 3.0 / r, rel=1e-4)

    def test_kinetic(self):
        v = jnp.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
        m = jnp.array([2.0, 1.0])
        ke = fd.kinetic_energy(v, m)
        assert float(ke) == pytest.approx(0.5 * 2 * 1 + 0.5 * 1 * 4)

    def test_modified_gravity_scales_force(self):
        pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        m = jnp.ones(2)
        a0 = fd.direct_accelerations(pos, m, 10.0, 0.01, 1.0, 0.0)
        a1 = fd.direct_accelerations(pos, m, 10.0, 0.01, 1.0, 0.5)
        np.testing.assert_allclose(np.asarray(a1), 1.5 * np.asarray(a0),
                                   rtol=1e-6)


class TestFactory:
    def test_registry_contents(self):
        from lambda_cdm_tpu.forces import available_force_computers
        names = available_force_computers()
        assert "direct" in names and "direct_reference" in names

    def test_create_from_config(self):
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.state import random_state
        from lambda_cdm_tpu.forces import create_force_computer
        cfg = SimulationConfig()
        cfg.particles.num_particles = 128
        cfg.forces.type = "direct_reference"
        accel_fn = create_force_computer(cfg)
        st = random_state(jax.random.PRNGKey(0), 128,
                          cfg.particles.box_size)
        acc = accel_fn(st)
        assert acc.shape == (128, 3)
        assert bool(jnp.all(jnp.isfinite(acc)))

    def test_unknown_type_falls_back(self):
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.forces import create_force_computer
        cfg = SimulationConfig()
        cfg.forces.type = "nonexistent_solver"
        cfg.forces.fallback = "direct_reference"
        assert create_force_computer(cfg) is not None

    def test_recommended_parameters(self):
        from lambda_cdm_tpu.forces import get_recommended_parameters
        p = get_recommended_parameters(1_000_000)
        assert p["pm_grid_size"] ** 3 >= 125_000


class TestPrecisionKnob:
    def test_bfloat16_precision_plumbs_through(self):
        """forces.precision selects the contraction precision in the jnp
        direct solvers (bf16 MXU operands / f32 accumulate on TPU; a
        no-op on CPU, where this asserts the plumbing only)."""
        import jax
        import jax.numpy as jnp
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.state import random_state
        from lambda_cdm_tpu.forces import create_force_computer
        st = random_state(jax.random.PRNGKey(0), 64, 20.0)
        for solver in ("direct_reference", "direct"):
            cfg = SimulationConfig()
            cfg.particles.num_particles = 64
            cfg.particles.box_size = 20.0
            cfg.forces.type = solver
            cfg.forces.precision = "bfloat16"
            acc = create_force_computer(cfg)(st)
            assert bool(jnp.all(jnp.isfinite(acc)))
