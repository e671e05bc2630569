"""On-device analysis throughput at the flagship scale (one TPU chip).

Times the analysis pipeline the BASELINE north star promises ("on-device
P(k) and lensing maps"): 256^3 power spectrum (deposit + transform +
binning), FoF halo finding + catalog at 1M particles, and the lens-plane
build. Run manually; results recorded in BASELINE.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    sys.path[0], ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(jnp.real(leaf).ravel()[0:1]))


def timeit(f, *a, reps=3):
    sync(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    sync(o)
    return (time.perf_counter() - t0) / reps, o


def main():
    print("devices:", jax.devices())
    n, box, ng = 1_000_000, 100.0, 256

    # mildly clustered field: uniform + a clumped fraction (FoF needs
    # some linking structure to exercise the union-find iterations).
    # Built under jit: eager ops on the axon TPU take MINUTES at 1M.
    @jax.jit
    def build():
        n_u = int(0.8 * n)
        pos_u = jax.random.uniform(jax.random.PRNGKey(0), (n_u, 3),
                                   maxval=box)
        centers = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                                     maxval=box)
        which = jax.random.randint(jax.random.PRNGKey(2), (n - n_u,),
                                   0, 256)
        pos_c = (centers[which] + 0.5 * jax.random.normal(
            jax.random.PRNGKey(3), (n - n_u, 3))) % box
        return jnp.concatenate([pos_u, pos_c], axis=0)

    pos = build()
    sync(pos)
    m = jnp.full((n,), 27.7536 * 0.31 * box ** 3 / n, jnp.float32)

    # P(k) at 256^3
    from lambda_cdm_tpu.analysis.power_spectrum import \
        measure_power_spectrum
    f_pk = jax.jit(lambda p, w: measure_power_spectrum(
        p, box, ng=ng, weights=w, assignment="cic", num_bins=64,
        deconvolve=True, subtract_shot_noise=True))
    dt_pk, pk = timeit(f_pk, pos, m)
    print(f"P(k) 1M -> 256^3 (CIC deposit + transform + 64 bins): "
          f"{dt_pk*1e3:.1f} ms")

    # FoF + halo catalog
    from lambda_cdm_tpu.analysis.halo_finder import (catalog_from_labels,
                                                     fof_labels, fof_plan)
    link = 0.2 * box / n ** (1 / 3)
    plan = fof_plan(n, box, link, positions=pos)
    print("fof plan:", plan)
    t0 = time.perf_counter()
    labels, ovf = fof_labels(pos, box, link, ncell=plan["ncell"],
                             capacity=plan["capacity"])
    sync(labels)
    dt_fof_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    labels, ovf = fof_labels(pos, box, link, ncell=plan["ncell"],
                             capacity=plan["capacity"])
    sync(labels)
    dt_fof = time.perf_counter() - t0
    print(f"FoF 1M (b=0.2): {dt_fof*1e3:.1f} ms "
          f"(first call incl. compile {dt_fof_c:.0f}s; "
          f"merged-cell overflow={int(ovf)})")

    from lambda_cdm_tpu.analysis.halo_finder import catalog_window_plan
    window = catalog_window_plan(pos, box)
    print("catalog window plan:", window)
    vel = jnp.zeros_like(pos)
    cat = catalog_from_labels(pos, vel, m, labels, box, window=window)
    sync(cat.mass)                       # compile + first run
    t0 = time.perf_counter()
    cat = catalog_from_labels(pos, vel, m, labels, box, window=window)
    sync(cat.mass)
    dt_cat = time.perf_counter() - t0
    print(f"halo catalog (CoM/R200/vmax/spin): {dt_cat*1e3:.1f} ms "
          f"({int(cat.num_halos)} halos >= 20 particles)")

    # lens planes from the snapshot
    from lambda_cdm_tpu.raytracing.lensing import \
        snapshot_lightcone_planes
    f_planes = jax.jit(lambda p, w: snapshot_lightcone_planes(
        p, w, box, ng=256, n_planes=16))
    dt_pl, _ = timeit(f_planes, pos, m)
    print(f"16 lens planes (3D CIC + slab sums @256^2): "
          f"{dt_pl*1e3:.1f} ms")


if __name__ == "__main__":
    main()
