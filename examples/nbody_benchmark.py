"""N-body throughput + energy-conservation demo.

Mirror of the reference's primary working driver `cuda_nbody_test`
(examples/cuda_nbody_test.cpp:9-101): evolve N particles with KDK leapfrog,
track relative energy drift, report particle-updates/s.

Usage: python examples/nbody_benchmark.py [N] [steps]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

import lambda_cdm_tpu as lc


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    monitor = lc.EnergyMonitor()
    engine = (lc.SimulationBuilder()
              .with_particles(n)
              .with_box_size(100.0)
              .with_time_step(1e-4)
              .with_force_computer("direct", softening_length=0.1)
              .with_cosmology(initial_redshift=9.0, model="Newtonian")
              .with_initial_conditions("uniform_random")
              .with_units("box", G=1.0, H0_internal=0.1)
              .with_observer(lc.ProgressObserver(every=max(steps // 10, 1)))
              .with_observer(monitor)
              .build())

    # small random velocities (the curand IC analogue,
    # lambda_cdm_impl.cu:25-49)
    st = engine.state
    vel = 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                   st.velocities.shape)
    engine.state = st.replace(velocities=vel)

    t0 = time.perf_counter()
    engine.run(num_steps=steps)
    wall = time.perf_counter() - t0

    err = monitor.history[-1]["relative_error"] if monitor.history else 0.0
    print(f"\nN={n}  steps={steps}  wall={wall:.2f}s")
    print(f"particle-updates/s: {n * steps / wall:.3e}")
    print(f"relative energy drift: {err:.3e} "
          f"({'PASS' if err < 1e-3 else 'CHECK'} vs 0.1% target, "
          f"reference CLAUDE.md:256)")


if __name__ == "__main__":
    main()
