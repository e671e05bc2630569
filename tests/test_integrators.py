"""Integrator tests: energy conservation (the cuda_nbody_test harness,
examples/cuda_nbody_test.cpp:57-88, as assertions), symplecticity,
time-reversibility, scale-factor ODE accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.physics import integrators as integ
from lambda_cdm_tpu.physics.cosmology import CosmologyParams
from lambda_cdm_tpu.forces.direct import (direct_accelerations,
                                          kinetic_energy, potential_energy)

PARAMS = CosmologyParams()


def _two_body_circular():
    """Two equal masses in circular orbit, Newtonian mode, G=1."""
    m, r = 1.0, 1.0
    # circular velocity for separation 2r around CoM: v^2 = G m / (4 r)
    v = np.sqrt(1.0 / (4 * r))
    box = 100.0
    c = box / 2
    pos = jnp.array([[c - r, c, c], [c + r, c, c]])
    vel = jnp.array([[0.0, -v, 0.0], [0.0, v, 0.0]])
    return make_state(pos, vel, jnp.ones(2)), box


def _accel_fn(box, soft=1e-4):
    def fn(state):
        return direct_accelerations(state.positions, state.masses, box, soft)
    return fn


class TestNewtonianOrbit:
    def test_energy_conservation_circular_orbit(self):
        state, box = _two_body_circular()
        accel = _accel_fn(box)
        dt = 0.02
        e0 = float(kinetic_energy(state.velocities, state.masses)
                   + potential_energy(state.positions, state.masses, box,
                                      softening=1e-4))

        def body(carry, _):
            st = integ.kdk_step(carry, accel, PARAMS, dt, box,
                                kick_mode="newtonian", cosmological=False)
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=500)
        e1 = float(kinetic_energy(state.velocities, state.masses)
                   + potential_energy(state.positions, state.masses, box,
                                      softening=1e-4))
        assert abs(e1 - e0) / abs(e0) < 1e-3

    def test_fused_step_matches_plain_step(self):
        state, box = _two_body_circular()
        accel = _accel_fn(box)
        dt = 0.05
        s_plain = state
        for _ in range(10):
            s_plain = integ.kdk_step(s_plain, accel, PARAMS, dt, box,
                                     kick_mode="newtonian",
                                     cosmological=False)
        s_fused, acc = state, accel(state)
        for _ in range(10):
            s_fused, acc = integ.kdk_step_fused(
                s_fused, acc, accel, PARAMS, dt, box,
                kick_mode="newtonian", cosmological=False)
        np.testing.assert_allclose(np.asarray(s_fused.positions),
                                   np.asarray(s_plain.positions),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(s_fused.velocities),
                                   np.asarray(s_plain.velocities),
                                   rtol=1e-5, atol=1e-6)

    def test_time_reversibility(self):
        """Leapfrog is time-reversible: run forward n steps, negate
        velocities, run n more -> back at the start."""
        state, box = _two_body_circular()
        accel = _accel_fn(box)
        dt = 0.02
        fwd = state
        for _ in range(50):
            fwd = integ.kdk_step(fwd, accel, PARAMS, dt, box,
                                 kick_mode="newtonian", cosmological=False)
        rev = fwd.replace(velocities=-fwd.velocities)
        for _ in range(50):
            rev = integ.kdk_step(rev, accel, PARAMS, dt, box,
                                 kick_mode="newtonian", cosmological=False)
        np.testing.assert_allclose(np.asarray(rev.positions),
                                   np.asarray(state.positions),
                                   atol=5e-4)

    def test_second_order_convergence(self):
        """Halving dt must shrink the position error ~4x (2nd order).
        float64: the truncation error must sit above the roundoff floor."""
        jax.config.update("jax_enable_x64", True)
        try:
            state, box = _two_body_circular()
            state = make_state(state.positions, state.velocities,
                               state.masses, dtype=jnp.float64)
            accel = _accel_fn(box)
            t_total = 1.0

            def run(dt, n):
                st = state
                for _ in range(n):
                    st = integ.kdk_step(st, accel, PARAMS, dt, box,
                                        kick_mode="newtonian",
                                        cosmological=False)
                return np.asarray(st.positions)

            ref = run(t_total / 512, 512)
            err1 = np.max(np.abs(run(t_total / 32, 32) - ref))
            err2 = np.max(np.abs(run(t_total / 64, 64) - ref))
            assert err1 / err2 > 3.0   # ~4 expected for 2nd order
        finally:
            jax.config.update("jax_enable_x64", False)


class TestScaleFactor:
    def test_rk4_matches_analytic_matter_era(self):
        """Einstein-de-Sitter: a(t) = (a0^{3/2} + (3/2) H0 t)^{2/3}."""
        eds = CosmologyParams(omega_m=1.0, omega_lambda=0.0, omega_b=0.049)
        h0 = 0.1
        a = jnp.asarray(0.02)
        dt = 0.05
        n = 200
        for _ in range(n):
            a = integ.update_scale_factor(eds, a, dt, h0, "rk4")
        t = n * dt
        analytic = (0.02 ** 1.5 + 1.5 * h0 * t) ** (2.0 / 3.0)
        assert float(a) == pytest.approx(analytic, rel=1e-4)

    def test_euler_reference_parity_less_accurate(self):
        eds = CosmologyParams(omega_m=1.0, omega_lambda=0.0)
        h0, dt, n = 0.1, 0.05, 200
        a_e = a_r = jnp.asarray(0.02)
        for _ in range(n):
            a_e = integ.update_scale_factor(eds, a_e, dt, h0, "euler")
            a_r = integ.update_scale_factor(eds, a_r, dt, h0, "rk4")
        analytic = (0.02 ** 1.5 + 1.5 * h0 * n * dt) ** (2.0 / 3.0)
        assert abs(float(a_r) - analytic) < abs(float(a_e) - analytic)

    def test_hubble_internal_units(self):
        # H0_internal=100 => H(a=1)=100*E(1)=100
        h = integ.hubble_internal(PARAMS, 1.0, 100.0)
        assert float(h) == pytest.approx(100.0, rel=1e-5)


class TestComovingMachinery:
    def test_kick_factors(self):
        a = jnp.asarray(0.5)
        assert float(integ.kick_factor(a, "reference")) == pytest.approx(4.0)
        assert float(integ.kick_factor(a, "comoving")) == pytest.approx(2.0)
        assert float(integ.drift_factor(a, "comoving")) == pytest.approx(4.0)
        assert float(integ.drift_factor(a, "reference")) == pytest.approx(1.0)

    def test_wrap_positions(self):
        pos = jnp.array([[-0.5, 10.5, 3.0]])
        w = integ.wrap_positions(pos, 10.0)
        np.testing.assert_allclose(np.asarray(w), [[9.5, 0.5, 3.0]],
                                   rtol=1e-6)

    def test_adaptive_dt_clamps(self):
        acc = jnp.ones((10, 3)) * 1e6
        dt = integ.adaptive_dt(acc, 0.01, 0.1, 1e-5, 0.1)
        assert 1e-5 <= float(dt) < 0.1

    def test_cosmological_step_expands(self):
        state, box = _two_body_circular()
        state = state.replace(scale_factor=jnp.asarray(0.02))
        accel = _accel_fn(box)
        out = integ.kdk_step(state, accel, PARAMS, 1e-4, box,
                             h0_internal=100.0, kick_mode="reference")
        assert float(out.scale_factor) > 0.02
        assert int(out.step) == 1
