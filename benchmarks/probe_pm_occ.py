"""A/B probe: occupancy-aware vs dense rod PM kernels on hardware.

Times pallas_deposit_rods / pallas_gather_fd4 with and without the
live-count occupancy path at the 1M bench geometry (ncell=24, cap=128,
ng=192, ~57% slot occupancy) and at a grown-capacity clustered-state
geometry (cap=256, ~28% occupancy) where the skip matters most.
Run under `timeout` in a fresh process (new Pallas kernels can wedge
the axon device; see CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0:1])


def timeit(f, *a, n=20):
    out = f(*a)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    from lambda_cdm_tpu.forces.treepm import bucket_particles
    from lambda_cdm_tpu.ops.pallas_pm_rods import (assemble_rods,
                                                   pallas_deposit_rods,
                                                   pallas_gather_fd4)

    print("devices:", jax.devices())
    n, box, ng, nc = 1_000_000, 100.0, 192, 24
    pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3), maxval=box)
    m = jnp.ones((n,))
    phi = jax.random.normal(jax.random.PRNGKey(1), (ng, ng, ng))

    for cap in (128, 256):
        bpos, bmass, _, ovf = bucket_particles(pos, m, box, ncell=nc,
                                               capacity=cap)
        counts = jnp.sum(bmass > 0, axis=1).astype(jnp.int32)
        occ_frac = float(counts.sum()) / (nc ** 3 * cap)
        print(f"--- cap={cap} occupancy={occ_frac:.2f} ovf={int(ovf)}")

        t_d, (bl_d, dr_d) = timeit(
            lambda: pallas_deposit_rods(bpos, bmass, ncell=nc, ng=ng,
                                        box_size=box))
        t_o, (bl_o, dr_o) = timeit(
            lambda: pallas_deposit_rods(bpos, bmass, ncell=nc, ng=ng,
                                        box_size=box, counts=counts))
        ga = assemble_rods(bl_d, ncell=nc, ng=ng)
        gb = assemble_rods(bl_o, ncell=nc, ng=ng)
        err = float(jnp.abs(ga - gb).max() / jnp.abs(ga).max())
        print(f"deposit dense {t_d:.1f} ms  occ {t_o:.1f} ms  "
              f"rel_err {err:.2e}")

        t_d, a_d = timeit(
            lambda: pallas_gather_fd4(phi, bpos, ncell=nc, ng=ng,
                                      box_size=box))
        t_o, a_o = timeit(
            lambda: pallas_gather_fd4(phi, bpos, ncell=nc, ng=ng,
                                      box_size=box, counts=counts))
        live = bmass > 0
        err = float(jnp.abs(jnp.where(live[..., None], a_d - a_o, 0.0)
                            ).max() / jnp.abs(a_d).max())
        print(f"gather  dense {t_d:.1f} ms  occ {t_o:.1f} ms  "
              f"rel_err {err:.2e}")


if __name__ == "__main__":
    main()
