"""Time integration: comoving kick-drift-kick leapfrog + scale-factor ODE.

Capability parity with the reference's integrator
(leapfrog_update kernel, src/physics/lambda_cdm_kernels.cu:290-335, driven
by LambdaCDMSimulationImpl::step, src/physics/lambda_cdm_impl.cu:167-213,
and update_scale_factor, :261-269).

Reference semantics (the default, `kick_mode="reference"`):
    kick:  v += a_acc * (dt/2) / a^2      (comoving suppression 1/a^2)
    drift: x = wrap(x + v * dt)
    a:     da/dt = a * H(a)               (forward Euler in the reference)

Improvements kept behind options (SURVEY.md section 2.4):
  * `scale_factor_update="rk4"` integrates the Friedmann ODE with RK4
    instead of forward Euler (default on; "euler" gives bit-parity).
  * `kick_mode="comoving"` uses the standard comoving-coordinate factors
    (kick 1/a, drift 1/a^2 for peculiar-velocity variables) for
    production cosmology runs.
  * adaptive timestep limiter (eta * sqrt(eps / |acc|_max)) mirroring the
    LeapfrogIntegrator config knobs (basic_lambda_cdm.json integration
    block) -- computed on device, applied via clipping so shapes stay
    static.

All functions are pure and jit/scan-friendly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .cosmology import CosmologyParams, e_function
from ..core.state import SimState


def hubble_internal(params: CosmologyParams, a, h0_internal):
    """H(a) in internal 1/time units: H0_internal * E(a).

    With the default unit system (length Mpc/h, velocity km/s),
    H0_internal = 100 regardless of h.
    """
    return h0_internal * e_function(params, a)


def scale_factor_derivative(params: CosmologyParams, a, h0_internal):
    """da/dt = a H(a) (reference: update_scale_factor,
    lambda_cdm_impl.cu:261-269)."""
    return a * hubble_internal(params, a, h0_internal)


def update_scale_factor(params: CosmologyParams, a, dt, h0_internal,
                        method: str = "rk4"):
    """Advance a by dt along the Friedmann equation."""
    f = lambda aa: scale_factor_derivative(params, aa, h0_internal)
    if method == "euler":
        return a + f(a) * dt  # reference parity
    k1 = f(a)
    k2 = f(a + 0.5 * dt * k1)
    k3 = f(a + 0.5 * dt * k2)
    k4 = f(a + dt * k3)
    return a + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def kick_factor(a, mode: str = "reference"):
    """Velocity-update prefactor for the comoving equations of motion."""
    if mode == "reference":
        return 1.0 / (a * a)   # lambda_cdm_kernels.cu:310-318
    if mode == "comoving":
        return 1.0 / a
    if mode == "newtonian":
        return jnp.ones_like(a)
    raise ValueError(f"unknown kick mode {mode!r}")


def drift_factor(a, mode: str = "reference"):
    """Position-update prefactor."""
    if mode == "reference" or mode == "newtonian":
        return jnp.ones_like(a)    # x += v dt (lambda_cdm_kernels.cu:321-333)
    if mode == "comoving":
        return 1.0 / (a * a)
    raise ValueError(f"unknown drift mode {mode!r}")


def wrap_positions(positions, box_size):
    """Periodic wrap into [0, box) (reference uses fmodf+shift,
    lambda_cdm_kernels.cu:324-331; jnp.mod handles negatives directly)."""
    return jnp.mod(positions, box_size)


def adaptive_dt(acc, softening, dt, min_dt, max_dt, eta=0.25,
                hubble=None, max_dloga=0.0):
    """Acceleration-based timestep limiter: dt <= eta*sqrt(eps/|a|_max),
    optionally ALSO expansion-limited: dt <= max_dloga / H(a) (the
    Gadget d(ln a) criterion — essential at high redshift where H dt
    per step otherwise reaches O(0.1)). Realizes the
    `adaptive_timestep` config capability."""
    amax = jnp.max(jnp.sqrt(jnp.sum(acc * acc, axis=-1)))
    dt_lim = eta * jnp.sqrt(softening / jnp.maximum(amax, 1e-30))
    if hubble is not None and max_dloga > 0:
        dt_lim = jnp.minimum(dt_lim, max_dloga / jnp.maximum(hubble,
                                                             1e-30))
    return jnp.clip(jnp.minimum(dt, dt_lim), min_dt, max_dt)


def kdk_step(state: SimState,
             accel_fn: Callable[[SimState], jax.Array],
             params: CosmologyParams,
             dt,
             box_size: float,
             *,
             h0_internal: float = 100.0,
             kick_mode: str = "reference",
             sf_method: str = "rk4",
             periodic: bool = True,
             cosmological: bool = True) -> SimState:
    """One kick-drift-kick leapfrog step (the hot loop body; reference:
    LambdaCDMSimulationImpl::step, lambda_cdm_impl.cu:167-213).

    `accel_fn(state) -> [N,3]` is any pluggable force solver (the
    IForceComputer role, interfaces.hpp:37-47). Symplectic for fixed dt.
    Unlike the reference (which drifts with the *pre-kick* velocity because
    kick and drift are issued on parallel streams, lambda_cdm_impl.cu:176-186),
    this is a correct K-D-K: half kick, full drift, half kick, with the
    scale factor advanced half-step-centred.
    """
    a0 = state.scale_factor
    dt = jnp.asarray(dt, state.positions.dtype)

    # first half-kick at a0
    acc = accel_fn(state)
    vel = state.velocities + acc * (0.5 * dt) * kick_factor(a0, kick_mode)

    # scale factor at mid-step for the drift
    if cosmological:
        a_half = update_scale_factor(params, a0, 0.5 * dt, h0_internal,
                                     sf_method)
    else:
        a_half = a0

    # drift
    pos = state.positions + vel * dt * drift_factor(a_half, kick_mode)
    if periodic:
        pos = wrap_positions(pos, box_size)

    # scale factor at end of step
    if cosmological:
        a1 = update_scale_factor(params, a_half, 0.5 * dt, h0_internal,
                                 sf_method)
    else:
        a1 = a0

    # second half-kick at a1 with re-evaluated forces
    mid = state.replace(positions=pos, velocities=vel, scale_factor=a1)
    acc2 = accel_fn(mid)
    vel = vel + acc2 * (0.5 * dt) * kick_factor(a1, kick_mode)

    return state.replace(
        positions=pos,
        velocities=vel,
        scale_factor=a1,
        time=state.time + dt,
        step=state.step + 1,
    )


def kdk_step_fused(state: SimState,
                   acc: jax.Array,
                   accel_fn: Callable[[SimState], jax.Array],
                   params: CosmologyParams,
                   dt,
                   box_size: float,
                   *,
                   h0_internal: float = 100.0,
                   kick_mode: str = "reference",
                   sf_method: str = "rk4",
                   periodic: bool = True,
                   cosmological: bool = True):
    """KDK step with ONE force evaluation: takes the acceleration computed
    at the current positions (= the closing half-kick force of the previous
    step) and returns the new state plus the acceleration at the new
    positions. This is the production loop body: inside `lax.scan` the force
    solver runs exactly once per step, like the reference's single
    launch_force_computation per step (lambda_cdm_impl.cu:190-196)."""
    a0 = state.scale_factor
    dt = jnp.asarray(dt, state.positions.dtype)

    vel = state.velocities + acc * (0.5 * dt) * kick_factor(a0, kick_mode)

    if cosmological:
        a_half = update_scale_factor(params, a0, 0.5 * dt, h0_internal,
                                     sf_method)
        a1 = update_scale_factor(params, a_half, 0.5 * dt, h0_internal,
                                 sf_method)
    else:
        a_half, a1 = a0, a0

    pos = state.positions + vel * dt * drift_factor(a_half, kick_mode)
    if periodic:
        pos = wrap_positions(pos, box_size)

    mid = state.replace(positions=pos, velocities=vel, scale_factor=a1)
    acc_new = accel_fn(mid)
    vel = vel + acc_new * (0.5 * dt) * kick_factor(a1, kick_mode)

    new_state = state.replace(
        positions=pos,
        velocities=vel,
        scale_factor=a1,
        time=state.time + dt,
        step=state.step + 1,
    )
    return new_state, acc_new
