"""Config-driven end-to-end simulation via SimulationBuilder.

Mirror of the reference's `basic_simulation` (examples/basic_simulation.cpp:
9-71) -- except this engine's step loop actually computes forces and
integrates (the reference's compute_forces/integrate_step were TODO stubs,
simulation_engine.cpp:275-288).

Usage: python examples/basic_simulation.py [config.json]
"""

import sys

sys.path.insert(0, ".")

import lambda_cdm_tpu as lc
from lambda_cdm_tpu.core.analysis_observers import (
    ConservationObserver, PowerSpectrumObserver)


def main():
    builder = lc.SimulationBuilder()
    if len(sys.argv) > 1:
        builder.with_config_file(sys.argv[1])
    else:
        (builder
         .with_particles(32 ** 3)
         .with_box_size(100.0)
         .with_time_step(5e-6)
         .with_force_computer("treepm", pm_grid_size=64,
                              softening_length=0.05)
         .with_cosmology(initial_redshift=49.0, final_redshift=20.0)
         .with_initial_conditions("2lpt", grid_size=32, random_seed=1))

    ps_obs = PowerSpectrumObserver(frequency=20, grid_size=64, num_bins=24)
    cons = ConservationObserver()
    engine = (builder
              .with_observer(lc.ProgressObserver(every=10))
              .with_observer(ps_obs)
              .with_observer(cons)
              .build())
    engine.run(num_steps=60)

    if ps_obs.results:
        last = ps_obs.results[-1]
        print(f"\nP(k) at step {last['step']} (a={last['scale_factor']:.4f}):")
        for k, p, c in zip(last["k"], last["power"], last["counts"]):
            if c > 10:
                print(f"  k={k:.3f}  P={p:.3f}")
    engine.profiler.print_summary()


if __name__ == "__main__":
    main()
