"""2D-pencil sharded fast-stepper demo (runs on a virtual CPU mesh).

The scale-out topology: FastState bucketed cells sharded over a 2D
(shx, shy) device mesh as (cx, cy)-rods with z local -- the TPU-native
counterpart of the reference's 3D MPI Cartesian rank grid
(domain_decomposition.cpp:10-112). Two ways to drive it:

  * engine API: compute.mesh.enabled + compute.mesh.axes={"shx","shy"}
  * direct API: parallel.fast_mesh2d (shown here, plus the engine form)

Run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/pencil2d_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _ensure_devices(want: int = 8) -> int:
    """A single-chip (or pre-bound) host can still run the demo on a
    virtual CPU mesh: force a CPU backend with `want` devices."""
    devs = jax.devices()
    if len(devs) >= 4 and len(devs) % 2 == 0:
        return len(devs)
    try:
        import jax.extend.backend as jexb
        jexb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", want)
    except Exception:
        pass
    return len(jax.devices())


def main():
    n_dev = _ensure_devices()
    if n_dev < 4 or n_dev % 2:
        print(f"needs an even device count >= 4, have {n_dev}; see the "
              "module docstring for the CPU-mesh env vars")
        return
    shape = (2, n_dev // 2)

    from lambda_cdm_tpu.parallel.fast_mesh2d import (initialize_mesh_fast2d,
                                                     mesh_fast_run2d)
    from lambda_cdm_tpu.parallel.mesh import make_mesh2d
    from lambda_cdm_tpu.physics.cosmology import CosmologyParams

    mesh = make_mesh2d(shape)
    print(f"2D mesh {shape} over {jax.devices()[0].platform} devices")

    n, box, ng = 8192, 64.0, 48
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    vel = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.full((n,), 13.0, jnp.float32)
    params = CosmologyParams()

    fs, kw = initialize_mesh_fast2d(pos, vel, mass, 0.5, mesh=mesh,
                                    box_size=box, pm_grid=ng,
                                    softening=0.3)
    print(f"plan: ncell={kw['ncell']} capacity={kw['capacity']} "
          f"rs={kw['rs']:.3f}")
    fs = mesh_fast_run2d(fs, params, 2e-4, mesh=mesh, n_steps=8,
                         rebucket_every=4, **kw)
    print(f"ran {int(fs.step)} steps: a={float(fs.scale_factor):.4f} "
          f"overflow={int(fs.overflow)} dropped={int(fs.dropped)}")

    # the same thing through the engine/config surface
    from lambda_cdm_tpu import SimulationConfig, SimulationEngine
    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.particles.initial_conditions.type = "uniform_random"
    cfg.forces.type = "treepm_fast"
    cfg.forces.pm_grid_size = ng
    cfg.forces.softening_length = 0.3
    cfg.time.initial_timestep = 2e-4
    cfg.cosmology.initial_redshift = 1.0
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    cfg.compute.mesh.enabled = True
    cfg.compute.mesh.axes = {"shx": shape[0], "shy": shape[1]}
    eng = SimulationEngine(cfg)
    eng.initialize()
    eng.run(num_steps=8)
    print(f"engine (2D mesh): {eng.statistics.total_steps} steps, "
          f"a={float(eng.state.scale_factor):.4f}")


if __name__ == "__main__":
    main()
