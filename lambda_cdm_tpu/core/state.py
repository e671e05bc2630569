"""Simulation state as a pure-functional PyTree.

The reference holds mutable device SoA state inside
``LambdaCDMSimulationImpl`` (float4* d_positions_, float3* d_velocities_,
d_forces_, scale factor, step counters -- src/physics/lambda_cdm_impl.cu:52-122)
and a separate Particle AoS struct (include/physics/lambda_cdm.hpp:13-18).

TPU-native design: one immutable dataclass PyTree that flows through a jitted
step function and `lax.scan`. Positions are stored in comoving coordinates in
[0, box); all arrays are SoA jnp arrays (the layout XLA wants), float32 by
default with an optional float64 oracle path on CPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimState:
    """Full simulation state. Everything needed to resume bit-exact
    (the checkpointing contract of IDataExporter, interfaces.hpp:70-82)."""

    positions: jax.Array      # [N, 3] comoving, in [0, box)
    velocities: jax.Array     # [N, 3]
    masses: jax.Array         # [N]
    scale_factor: jax.Array   # [] current a
    time: jax.Array           # [] integrated simulation time (internal units)
    step: jax.Array           # [] int32 step counter
    rng_key: jax.Array        # PRNG key for any stochastic component

    @property
    def num_particles(self) -> int:
        return self.positions.shape[0]

    @property
    def redshift(self):
        """z = 1/a - 1 (reference: SimulationContext::get_redshift)."""
        return 1.0 / self.scale_factor - 1.0

    def replace(self, **kw) -> "SimState":
        return dataclasses.replace(self, **kw)


def make_state(positions, velocities, masses, scale_factor=1.0, time=0.0,
               step=0, rng_key=None, dtype=jnp.float32) -> SimState:
    """Build a SimState with canonical dtypes/shapes."""
    positions = jnp.asarray(positions, dtype)
    velocities = jnp.asarray(velocities, dtype)
    masses = jnp.asarray(masses, dtype)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    return SimState(
        positions=positions,
        velocities=velocities,
        masses=masses,
        scale_factor=jnp.asarray(scale_factor, dtype),
        time=jnp.asarray(time, dtype),
        step=jnp.asarray(step, jnp.int32),
        rng_key=rng_key,
    )


def random_state(key, num_particles: int, box_size: float,
                 velocity_scale: float = 1.0, mass: float = 1.0,
                 scale_factor: float = 1.0) -> SimState:
    """Uniform random positions + Gaussian velocities -- the quick-start IC
    the reference bakes into its curand kernels
    (generate_initial_conditions, lambda_cdm_impl.cu:25-49)."""
    kp, kv, krest = jax.random.split(key, 3)
    pos = jax.random.uniform(kp, (num_particles, 3), minval=0.0,
                             maxval=box_size)
    vel = velocity_scale * jax.random.normal(kv, (num_particles, 3))
    masses = jnp.full((num_particles,), mass, jnp.float32)
    return make_state(pos, vel, masses, scale_factor=scale_factor,
                      rng_key=krest)
