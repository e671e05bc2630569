"""Where do catalog_from_labels' 2.5 s go at 1M particles?

Sections timed separately (same shapes as bench_analysis):
  global  -- the label-space segment_sums (counts/msum/CoM phases/vel)
  map     -- the per-halo profile loop (distances + radial histogram)
  hist    -- the map WITHOUT the segment_sum histogram (elementwise only)
Run manually on the TPU; informs the windowed-catalog design.
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
    n, box = 1_000_000, 100.0
    max_halos, nbins = 256, 64

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
        pos = jnp.concatenate([pos_u, pos_c], axis=0)
        # synthetic labels: clustered particles keep their blob id as a
        # root in [0, 256); field particles are singletons
        lab = jnp.concatenate([jnp.arange(n_u, dtype=jnp.int32) + 256,
                               which.astype(jnp.int32)])
        return pos, lab

    pos, labels = build()
    sync(pos)
    vel = jnp.zeros_like(pos)
    m = jnp.full((n,), 1.0, jnp.float32)

    from lambda_cdm_tpu.analysis.halo_finder import catalog_from_labels
    f_cat = jax.jit(lambda p, v, w, l: catalog_from_labels(
        p, v, w, l, box, max_halos=max_halos))
    dt, cat = timeit(f_cat, pos, vel, m, labels)
    print(f"full catalog: {dt*1e3:.1f} ms ({int(cat.num_halos)} halos)")

    @jax.jit
    def global_sums(p, v, w, l):
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), l,
                                     num_segments=n)
        theta = p / box * (2.0 * jnp.pi)
        msum = jax.ops.segment_sum(w, l, num_segments=n)
        cx = jax.ops.segment_sum(w[:, None] * jnp.cos(theta), l,
                                 num_segments=n)
        sx = jax.ops.segment_sum(w[:, None] * jnp.sin(theta), l,
                                 num_segments=n)
        vs = jax.ops.segment_sum(w[:, None] * v, l, num_segments=n)
        return counts, msum, cx, sx, vs

    dt_g, _ = timeit(global_sums, pos, vel, m, labels)
    print(f"global label segment_sums: {dt_g*1e3:.1f} ms")

    from lambda_cdm_tpu.forces.direct import min_image
    centers = jax.random.uniform(jax.random.PRNGKey(7),
                                 (max_halos, 3), maxval=box)
    r_max = 0.1 * box

    def profile_map(with_hist):
        def halo_profile(c):
            d = min_image(pos - c[None, :], box)
            r = jnp.sqrt(jnp.sum(d * d, axis=-1))
            bin_idx = jnp.clip((r / r_max * nbins).astype(jnp.int32),
                               0, nbins - 1)
            if with_hist:
                hist = jax.ops.segment_sum(
                    jnp.where(r < r_max, m, 0.0), bin_idx,
                    num_segments=nbins)
            else:
                hist = jnp.zeros((nbins,)).at[0].set(
                    jnp.sum(jnp.where(r < r_max, m, 0.0)))
            ell = jnp.cross(d, vel) * m[:, None]
            ell = jnp.sum(jnp.where((r < r_max)[:, None], ell, 0.0),
                          axis=0)
            return jnp.cumsum(hist), ell

        return jax.jit(lambda cs: jax.lax.map(halo_profile, cs))

    dt_m, _ = timeit(profile_map(True), centers)
    print(f"per-halo map WITH histogram: {dt_m*1e3:.1f} ms")
    dt_h, _ = timeit(profile_map(False), centers)
    print(f"per-halo map elementwise-only: {dt_h*1e3:.1f} ms")


if __name__ == "__main__":
    main()
