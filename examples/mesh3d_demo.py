"""3D block-decomposition demo (runs on a virtual CPU mesh).

The full Cartesian scale-out topology: particles owned by (2, 2, 2)
box blocks, migrated with one all_to_all over the flattened 3D device
mesh, short-range forces from block-local cell buckets + the
26-neighbor ghost exchange (faces, edges and corners in 6
dimension-ordered ppermutes) -- the TPU-native counterpart of the
reference's MPI_Cart_create 3D rank grid + ghost Sendrecv
(domain_decomposition.cpp:10-112, cluster_comm.cpp:25-88). Two drives:

  * direct API: parallel.sharded_treepm (shown first)
  * engine API: compute.mesh.enabled + axes={"shx","shy","shz"}

Run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/mesh3d_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _ensure_devices(want: int = 8) -> int:
    devs = jax.devices()
    if len(devs) >= want:
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
    n_dev = _ensure_devices(8)
    if n_dev < 8:
        print(f"need 8 devices for the (2,2,2) mesh, have {n_dev}")
        return

    import numpy as np

    from lambda_cdm_tpu.parallel import sharded_treepm as stp
    from lambda_cdm_tpu.parallel.exchange import (migrate_particles,
                                                  pad_particles)
    from lambda_cdm_tpu.parallel.mesh import make_mesh3d, particle_sharding

    ax = ("shx", "shy", "shz")
    mesh = make_mesh3d((2, 2, 2))
    print(f"3D device mesh: {dict(mesh.shape)}")

    n, box, ng = 4096, 100.0, 64
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    vel = jnp.zeros((n, 3), jnp.float32)
    m = jnp.ones((n,), jnp.float32)

    # 1) migrate particles to their owning (i, j, k) blocks
    pos, vel, m = pad_particles(pos, vel, m, n_dev=8, factor=1.5)
    ps = particle_sharding(mesh, ax)
    pos, vel, m = (jax.device_put(pos, ps), jax.device_put(vel, ps),
                   jax.device_put(m, ps))
    pos, vel, m, ovf = migrate_particles(
        pos, vel, m, box_size=box, capacity=pos.shape[0] // 8,
        mesh=mesh, axis_name=ax)
    print(f"3D migration: overflow={int(ovf)} "
          f"(live rows per block: {int((np.asarray(m) > 0).sum()) // 1})")

    # 2) full TreePM: GSPMD PM long-range + 26-neighbor halo short-range
    acc, diag = stp.sharded_treepm_accelerations(
        pos, m, box_size=box, pm_grid=ng, softening=0.5,
        g_const=43.007, mesh=mesh, axis_name=ax,
        return_diagnostics=True)
    print(f"block-halo TreePM: plan nc={diag['plan']['nc']} "
          f"cap={diag['plan']['capacity']} "
          f"overflow={int(diag['overflow'])} "
          f"|acc| p50={float(jnp.median(jnp.linalg.norm(acc, axis=1))):.3e}")

    # 3) the PERSISTENT 3D-block fast stepper (parallel/fast_mesh3d):
    # 3-phase halo exchanges, cube<->pencil FFT Poisson, 3-phase
    # emigrant rebucket
    from lambda_cdm_tpu.parallel.fast_mesh3d import (
        initialize_mesh_fast3d, mesh_fast_run3d)
    from lambda_cdm_tpu.physics.cosmology import CosmologyParams
    fs3, kw3 = initialize_mesh_fast3d(
        pos, vel, m, 0.1, mesh=mesh, box_size=box, pm_grid=ng,
        softening=0.5)
    fs3 = mesh_fast_run3d(fs3, CosmologyParams(), 2e-5, mesh=mesh,
                          n_steps=4, rebucket_every=2, **kw3)
    print(f"persistent 3D fast stepper: ncell={kw3['ncell']} "
          f"cap={kw3['capacity']} step={int(fs3.step)} "
          f"overflow={int(fs3.overflow)} dropped={int(fs3.dropped)}")

    # 4) the same topology behind the engine API (forces.type=
    # treepm_fast would route through the persistent stepper above;
    # plain treepm uses the stateless halo path of section 2)
    import lambda_cdm_tpu as lc
    from lambda_cdm_tpu.core.config import SimulationConfig
    cfg = SimulationConfig()
    cfg.particles.num_particles = 4096
    cfg.particles.box_size = box
    cfg.forces.type = "treepm_fast"
    cfg.forces.pm_grid_size = ng
    cfg.forces.softening_length = 0.5
    cfg.compute.mesh.enabled = True
    cfg.compute.mesh.axes = {"shx": 2, "shy": 2, "shz": 2}
    cfg.cosmology.initial_redshift = 24.0
    cfg.cosmology.final_redshift = 0.0
    cfg.simulation.time_step = 2e-5
    eng = lc.SimulationEngine(cfg)
    eng.initialize()
    eng.run(num_steps=4)
    e = eng.compute_energy()
    print(f"engine on the 3D mesh (treepm_fast): "
          f"step={int(eng.state.step)} "
          f"E_total={float(e['total']):.4e}")


if __name__ == "__main__":
    main()
