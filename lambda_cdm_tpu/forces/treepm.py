"""TreePM gravity: PM long-range + cell-bucketed short-range pairwise.

This replaces the reference's Barnes-Hut tree family (GPU LBVH
src/forces/barnes_hut_tree.cu, CPU octree src/forces/tree_force_computer.cpp)
with the TPU-idiomatic O(N) short-range + O(ng^3 log ng) long-range split
(SURVEY.md section 7: pointer-chasing trees are explicitly not ported; their
capability -- better-than-O(N^2) scaling with direct-sum-level accuracy --
is delivered by this solver).

Force split (Gadget-style Gaussian):
    long:  Green's function x exp(-k^2 rs^2)      (forces/pm.py)
    short: a_ij = G m_j dx/r^3 * S(r),
           S(r) = erfc(r/2rs) + (r/(rs sqrt(pi))) exp(-r^2/4rs^2)
    S is negligible beyond r_cut ~ 4.5-5 rs, so short-range pairs are
    confined to 27 neighbor cells of size >= r_cut.

Static-shape machinery (XLA requirement; SURVEY.md section 5 "fixed-capacity
buckets with masking"):
    sort particles by cell id -> rank-in-cell -> scatter into
    [ncell^3, CAPACITY] buckets (overflow counted, not silently dropped) ->
    27 rolled-neighbor pairwise passes, scanned over x-slabs to bound
    memory -> gather per-particle accelerations back through the bucket
    permutation. Overflowing particles (beyond CAPACITY) fall back to the
    PM-only force for that step; the overflow count is returned so callers
    can re-bucket with a bigger capacity.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .pm import pm_accelerations
from .direct import min_image


def short_range_factor(r, rs):
    """S(r): the erfc short-range truncation of the Gaussian split."""
    x = r / (2.0 * rs)
    return jax.lax.erfc(x) + (r / (rs * jnp.sqrt(jnp.pi))) * jnp.exp(-x * x)


def _fit_short_poly(degree: int = 10, x_max: float = 3.0):
    """Least-squares polynomial fit of S(x) = erfc(x) + (2x/sqrt(pi))e^-x^2
    on [0, x_max] (host-side, at import). Replaces two transcendentals per
    pair interaction with `degree` FMAs on the VPU; max abs error ~1e-5."""
    import math

    import numpy as np
    x = np.linspace(0.0, x_max, 4001)
    s = np.array([math.erfc(v) + (2.0 * v / math.sqrt(math.pi))
                  * math.exp(-v * v) for v in x])
    coeffs = np.polyfit(x, s, degree)
    err = float(np.max(np.abs(np.polyval(coeffs, x) - s)))
    assert err < 5e-4, f"short-range poly fit error {err}"
    return jnp.asarray(coeffs.astype(np.float32)), x_max


_S_POLY_COEFFS, _S_POLY_XMAX = _fit_short_poly()


def short_range_factor_poly(r, rs):
    """Polynomial S(r) (hot-loop variant): exact-fit on x in [0, 3],
    hard zero beyond (S(3) = 2e-5)."""
    x = r / (2.0 * rs)
    s = jnp.polyval(_S_POLY_COEFFS, jnp.minimum(x, _S_POLY_XMAX))
    return jnp.where(x < _S_POLY_XMAX, jnp.maximum(s, 0.0), 0.0)


def treepm_plan(num_particles: int, box_size: float, pm_grid: int,
                *, split_factor: float = 1.25, cut_factor: float = 4.5,
                capacity: int = 0) -> dict:
    """Static geometry for the short-range pass (computed at trace time).

    rs = split_factor * (box/pm_grid); r_cut = cut_factor * rs; cells of
    size >= r_cut. cf. get_recommended_parameters heuristics
    (force_computer_factory.cpp:81-113).
    """
    rs = split_factor * box_size / pm_grid
    r_cut = cut_factor * rs
    ncell = max(int(math.floor(box_size / r_cut)), 1)
    # guard: at least 3 cells per axis for the 27-stencil to make sense
    if ncell < 3:
        ncell = 1
    if capacity <= 0:
        mean_occ = num_particles / max(ncell ** 3, 1)
        capacity = int(max(32, math.ceil(4.0 * mean_occ)))
        capacity = ((capacity + 7) // 8) * 8
    return {"rs": rs, "r_cut": r_cut, "ncell": ncell, "capacity": capacity}


@partial(jax.jit, static_argnames=("ncell", "capacity"))
def bucket_src_map(positions, masses, box_size, *, ncell: int,
                   capacity: int):
    """Inverse slot map for cell bucketing: src[dest_slot] = source row
    (or n = sentinel for empty slots), built with one argsort + ONE
    int32 scatter. Every bucketed array is then a row GATHER
    `concat([x, pad])[src]` -- XLA [N,3] scatters run ~8x slower than
    gathers on TPU (149 vs 17.5 ms at 1.77M rows on v5e), so this is
    the fast path for bucketing ANY number of per-particle arrays.

    Returns (src [C*capacity] int32, slot [n] int32 in sorted order,
    order [n], ok [n] bool, overflow).
    """
    # SoA [3, N] accepted alongside [N, 3]: the single-chip fast
    # stepper keeps vectors SoA (AoS [.., 3]-minor arrays risk 42x
    # lane-padded relayout copies; ops/pallas_short_range docstring).
    # Each form is indexed natively -- no cross-layout transposes.
    soa = positions.ndim == 2 and positions.shape[0] == 3
    n = positions.shape[1] if soa else positions.shape[0]
    ncells = ncell ** 3
    comps = ((positions[0], positions[1], positions[2]) if soa else
             (positions[:, 0], positions[:, 1], positions[:, 2]))
    cx, cy, cz = (jnp.clip(jnp.floor(c / box_size * ncell)
                           .astype(jnp.int32), 0, ncell - 1)
                  for c in comps)
    cid = (cx * ncell + cy) * ncell + cz
    # dead (zero-mass padding) rows go to a virtual overflow cell so
    # they never consume real-cell capacity
    live = masses > 0
    cid = jnp.where(live, cid, ncells)

    order = jnp.argsort(cid)
    cid_s = cid[order]
    live_s = live[order]

    # rank within own cell = index - first index of that cid: run starts
    # via a cummax (cheaper than searchsorted's extra binary-search pass)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                cid_s[1:] != cid_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - run_start
    ok = (rank < capacity) & live_s
    nslots = ncells * capacity
    slot = jnp.where(ok, cid_s * capacity + rank, nslots)
    overflow = jnp.sum(~ok & live_s)

    # NOT indices_are_sorted: overflow rows target the drop sentinel
    # MID-sequence, so slot is unsorted whenever overflow > 0 — the
    # sorted hint corrupted the whole layout on real TPUs
    src = jnp.full((nslots,), n, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    return src, slot, order, ok, overflow


def bucket_gather(x, src, fill=0.0):
    """Re-bucket one per-particle array by the bucket_src_map: a single
    row gather with a sentinel pad row."""
    pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)[src]


def bucket_particles(positions, masses, box_size, *, ncell: int,
                     capacity: int):
    """Sort particles into [ncell^3, capacity] cell buckets.

    Returns (bucket_pos [C,K,3], bucket_mass [C,K], particle_slot [N],
    overflow_count). particle_slot[p] = flat bucket slot holding particle p,
    or -1 if it overflowed. Padding has mass 0 (so it contributes no force).
    """
    n = positions.shape[0]
    ncells = ncell ** 3
    src, slot, order, ok, overflow = bucket_src_map(
        positions, masses, box_size, ncell=ncell, capacity=capacity)
    bpos = bucket_gather(positions, src, 0.0)
    bmass = bucket_gather(jnp.where(masses > 0, masses, 0.0), src, 0.0)

    # map original particle index -> its slot (-1 on overflow/dead)
    pslot = jnp.full((n,), -1, jnp.int32)
    pslot = pslot.at[order].set(
        jnp.where(ok, slot, -1).astype(jnp.int32))
    return (bpos.reshape(ncells, capacity, 3),
            bmass.reshape(ncells, capacity), pslot, overflow)


@partial(jax.jit, static_argnames=("ncell", "capacity", "use_poly"))
def short_range_bucketed(bucket_pos, bucket_mass, box_size, rs, softening,
                         *, ncell: int, capacity: int,
                         use_poly: bool = False):
    """Short-range accelerations for every bucket slot -> [C, K, 3].

    27 neighbor passes via jnp.roll on the [nc,nc,nc,K,...] lattice,
    scanned over x-slabs so the pairwise temp is [nc^2 * K, K] per slab.
    """
    nc, k = ncell, capacity
    bp = bucket_pos.reshape(nc, nc, nc, k, 3)
    bm = bucket_mass.reshape(nc, nc, nc, k)
    soft2 = softening * softening
    acc = jnp.zeros_like(bp)
    s_fn = short_range_factor_poly if use_poly else short_range_factor

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                np_pos = jnp.roll(bp, shift=(-ox, -oy, -oz), axis=(0, 1, 2))
                np_mass = jnp.roll(bm, shift=(-ox, -oy, -oz), axis=(0, 1, 2))

                def slab(carry, xs):
                    cp, cm_nb_pos, nb_mass = xs
                    # cp: [nc,nc,K,3] center positions for this x-slab
                    # cm_nb_pos: [nc,nc,K,3] neighbor positions
                    dx = min_image(cm_nb_pos[:, :, None, :, :]
                                   - cp[:, :, :, None, :], box_size)
                    r2 = jnp.sum(dx * dx, axis=-1) + soft2
                    inv_r = jax.lax.rsqrt(r2)
                    r = r2 * inv_r
                    s = s_fn(r, rs)
                    w = (nb_mass[:, :, None, :] * s
                         * (inv_r * inv_r * inv_r))
                    return carry, jnp.sum(w[..., None] * dx, axis=3)

                _, a = jax.lax.scan(
                    slab, None, (bp, np_pos, np_mass))
                acc = acc + a
    return acc.reshape(nc ** 3, k, 3)


@partial(jax.jit, static_argnames=("ncell", "capacity", "use_poly"))
def short_range_targets(bpos_soa, bmass, rows, box_size, rs, softening,
                        *, ncell: int, capacity: int,
                        use_poly: bool = True):
    """Short-range accelerations for SELECTED flat bucket rows only
    -> [T, 3], bitwise the same pair set/math as `short_range_bucketed`
    (27 neighbor cells, min-image, poly split) but O(T * 27 * capacity)
    instead of O(C * K * 27 * K). This makes kernel-parity attribution
    affordable at production capacities (cap 512+: the full jnp lattice
    pass is 2e11 pair-slots; 512 targets are 7e6) — the 3-way accuracy
    split in bench.py (Pallas-vs-jnp / jnp-vs-oracle / oracle-vs-Ewald)
    runs this as its jnp leg.

    bpos_soa: [3, C, K] (the fast stepper's SoA layout), bmass [C, K],
    rows: [T] int32 flat indices into C*K.
    """
    nc, k = ncell, capacity
    c_cnt = nc ** 3
    soft2 = softening * softening
    s_fn = short_range_factor_poly if use_poly else short_range_factor

    rows = rows.astype(jnp.int32)
    cell = rows // k
    cx, cy, cz = cell // (nc * nc), (cell // nc) % nc, cell % nc
    pt = bpos_soa.reshape(3, c_cnt * k)[:, rows]            # [3, T]

    offs = jnp.asarray([(ox, oy, oz)
                        for ox in (-1, 0, 1) for oy in (-1, 0, 1)
                        for oz in (-1, 0, 1)], dtype=jnp.int32)
    nx = (cx[:, None] + offs[None, :, 0]) % nc
    ny = (cy[:, None] + offs[None, :, 1]) % nc
    nz = (cz[:, None] + offs[None, :, 2]) % nc
    ncid = (nx * nc + ny) * nc + nz                         # [T, 27]

    bp = bpos_soa.reshape(3, c_cnt, k)
    nb_pos = bp[:, ncid]                                    # [3, T, 27, K]
    nb_mass = bmass.reshape(c_cnt, k)[ncid]                 # [T, 27, K]

    dx = min_image(nb_pos - pt[:, :, None, None], box_size)
    r2 = jnp.sum(dx * dx, axis=0) + soft2                   # [T, 27, K]
    inv_r = jax.lax.rsqrt(r2)
    w = nb_mass * s_fn(r2 * inv_r, rs) * (inv_r * inv_r * inv_r)
    # self-pair: dx == 0 -> zero contribution, same as the lattice pass
    return jnp.sum(w[None] * dx, axis=(2, 3)).T             # [T, 3]


def treepm_accelerations(positions, masses, box_size, *, pm_grid: int,
                         softening=0.01, g_const=1.0,
                         split_factor: float = 1.25,
                         cut_factor: float = 4.5, capacity: int = 0,
                         return_diagnostics: bool = False):
    """Full TreePM accelerations [N,3] = PM(long) + bucketed short-range.

    For boxes too small to host a 3^3 cell lattice the solver degrades to
    pure PM with an unsplit Green's function (exact same API).
    """
    n = positions.shape[0]
    plan = treepm_plan(n, float(box_size), pm_grid,
                       split_factor=split_factor, cut_factor=cut_factor,
                       capacity=capacity)
    ncell, cap, rs = plan["ncell"], plan["capacity"], plan["rs"]

    if ncell == 1:
        acc = pm_accelerations(positions, masses, pm_grid, box_size,
                               g_const, split_scale=0.0)
        return (acc, {"overflow": jnp.zeros((), jnp.int32), **plan}) \
            if return_diagnostics else acc

    acc_long = pm_accelerations(positions, masses, pm_grid, box_size,
                                g_const, split_scale=rs)

    bpos, bmass, pslot, overflow = bucket_particles(
        positions, masses, box_size, ncell=ncell, capacity=cap)
    acc_short_b = short_range_bucketed(
        bpos, bmass, box_size, rs, softening, ncell=ncell, capacity=cap)

    flat = acc_short_b.reshape(-1, 3)
    safe_slot = jnp.maximum(pslot, 0)
    acc_short = jnp.where((pslot >= 0)[:, None], flat[safe_slot], 0.0)
    acc = acc_long + g_const * acc_short

    if return_diagnostics:
        return acc, {"overflow": overflow, **plan}
    return acc
