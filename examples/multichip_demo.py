"""Multi-chip sharded simulation demo (runs on a virtual CPU mesh too).

The ICI replacement for the reference's MPI layer (SURVEY.md section 2.6):
ring-direct forces via ppermute, GSPMD-sharded PM, all_to_all particle
migration. Run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/multichip_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.parallel.exchange import (load_imbalance,
                                              migrate_particles,
                                              pad_particles)
from lambda_cdm_tpu.parallel.mesh import make_mesh, shard_state
from lambda_cdm_tpu.parallel.sharded import (ring_direct_accelerations,
                                             sharded_energy)
from lambda_cdm_tpu.physics.cosmology import CosmologyParams
from lambda_cdm_tpu.physics.integrators import kdk_step_fused


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"mesh: {n_dev} x {jax.devices()[0].platform}")

    n, box, soft, dt = 512 * n_dev, 100.0, 0.5, 1e-5
    params = CosmologyParams()
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    vel = jnp.zeros((n, 3))
    mass = jnp.ones((n,))
    pos, vel, mass = pad_particles(pos, vel, mass, n_dev=n_dev, factor=1.5)
    state = shard_state(make_state(pos, vel, mass, scale_factor=0.1), mesh)

    def accel(st):
        return ring_direct_accelerations(
            st.positions, st.masses, box_size=box, softening=soft,
            mesh=mesh)

    @jax.jit
    def step(st, acc):
        return kdk_step_fused(st, acc, accel, params, dt, box,
                              h0_internal=100.0)

    acc = accel(state)
    for i in range(10):
        state, acc = step(state, acc)
        if i % 5 == 4:
            # capacity must cover the self-destination bucket: after a
            # previous homing, all live local rows target the same device
            n_loc = state.positions.shape[0] // n_dev
            p2, v2, m2, ovf = migrate_particles(
                state.positions, state.velocities, state.masses,
                box_size=box, capacity=n_loc, mesh=mesh)
            state = state.replace(positions=p2, velocities=v2, masses=m2)
            imb = float(load_imbalance(state.masses, mesh=mesh))
            print(f"step {i + 1}: migrated (overflow={int(ovf)}), "
                  f"load imbalance {imb:.3f}")

    e = sharded_energy(state.positions, state.velocities, state.masses,
                       box_size=box, softening=soft, g_const=1.0, mesh=mesh)
    print(f"final energy (psum over {n_dev} devices): "
          f"KE={float(e['kinetic']):.4e} PE={float(e['potential']):.4e}")


if __name__ == "__main__":
    main()
