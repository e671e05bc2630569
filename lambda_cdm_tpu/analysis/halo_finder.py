"""Friends-of-friends halo finder + spherical-overdensity refinement,
fully on-device.

TPU-native rebuild of the reference's halo finding
(src/analysis/halo_finder.cpp:15-444): the grid-accelerated union-find
becomes iterative minimum-label propagation over a 27-cell stencil with
pointer jumping -- a data-parallel connected-components algorithm that
converges in O(log N) rounds under `lax.while_loop` (static shapes, no
recursion), exactly the structure SURVEY.md section 7 M3 prescribes.

Outputs mirror the reference's Halo struct (include/analysis/halo_finder.hpp:
10-22): center of mass, mean velocity, total mass, virial radius
(overdensity Delta=200), maximum circular velocity, particle count,
angular momentum, spin parameter -- computed with segment reductions
(halo_finder.cpp:234-337 parity).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..forces.direct import min_image
from ..forces.treepm import bucket_gather, bucket_src_map  # noqa: F401


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloCatalog:
    """Fixed-capacity halo catalog (top `max_halos` by particle count).

    Mirrors reference Halo fields (halo_finder.hpp:10-22). Slots beyond
    `num_halos` are zero-padded.
    """
    num_halos: jax.Array          # [] int32
    n_particles: jax.Array        # [H] int32
    center: jax.Array             # [H, 3] center of mass
    velocity: jax.Array           # [H, 3] CoM velocity
    mass: jax.Array               # [H]
    radius: jax.Array             # [H] R_Delta (SO radius)
    v_max: jax.Array              # [H] max circular velocity
    angular_momentum: jax.Array   # [H, 3]
    spin: jax.Array               # [H] Peebles spin parameter
    particle_label: jax.Array     # [N] halo id per particle (-1 = field)
    # [] int32: live particles NOT represented in the windowed
    # SO/vmax/L profiles because a window cell exceeded the supplied
    # capacity (0 on the exact path, and whenever the window came from
    # catalog_window_plan on the same positions). Per the repo rule,
    # drops are counted, never silent. default_factory (not None): a
    # None default would flatten to an empty subtree, giving catalogs a
    # population-dependent treedef that breaks tree_map/lax.cond
    # structure matching.
    profile_dropped: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# FoF via label propagation
# ---------------------------------------------------------------------------

_NEIGHBOR_SHIFTS = [(ox, oy, oz)
                    for ox in (-1, 0, 1)
                    for oy in (-1, 0, 1)
                    for oz in (-1, 0, 1)]


@partial(jax.jit, static_argnames=("ncell", "capacity"))
def _fof_setup(positions, live, box_size, ncell: int, capacity: int):
    """Bucket particles and build the slot<->particle maps. Dead rows
    (live == False, the zero-mass padding convention) go to
    bucket_src_map's virtual overflow cell: never bucketed, never
    counted as overflow.

    Bucketed coordinates come back as THREE [C, K] arrays, never one
    [C, K, 3]: TPU tiling pads the two minor dims to (8, 128), so a
    3-minor coordinate axis padds 3 -> 128 = 42.7x memory -- a
    [32768, 1024, 3] lattice copy is 16 GB of HBM (the round-2 1M
    clustered OOM)."""
    n = positions.shape[0]
    ncells = ncell ** 3
    masses = jnp.where(live, 1.0, 0.0).astype(jnp.float32)
    src, slot, order, ok, overflow = bucket_src_map(
        positions, masses, box_size, ncell=ncell, capacity=capacity)
    bxyz = tuple(
        bucket_gather(positions[:, c], src, 0.0).reshape(ncells, capacity)
        for c in range(3))
    occupied = bucket_gather(masses, src, 0.0) \
        .reshape(ncells, capacity) > 0        # [C, K]
    pslot = jnp.full((n,), -1, jnp.int32)
    pslot = pslot.at[order].set(jnp.where(ok, slot, -1).astype(jnp.int32))
    # slot -> particle index (n where empty); bucketing is one-to-one on
    # occupied slots so .min is exact
    safe_slot = jnp.maximum(pslot, 0)
    slot_particle = jnp.full((ncells * capacity,), n, jnp.int32)
    slot_particle = slot_particle.at[safe_slot].min(
        jnp.where(pslot >= 0, jnp.arange(n, dtype=jnp.int32), n))
    counts = jnp.sum(occupied, axis=1).astype(jnp.int32)  # live per cell
    return bxyz, occupied, counts, pslot, slot_particle, overflow


@partial(jax.jit, static_argnames=("ncell", "capacity", "box_size",
                                  "linking_length", "hook", "reverse"))
def _fof_round(lab_p, bxyz, occupied, counts, pslot, *, box_size: float,
               linking_length: float, ncell: int, capacity: int,
               hook: str = "jnp", reverse: bool = False, active=None):
    """One hook-and-compress round as a single bounded device program.

    `lab_p` [N] int32 holds particle-space labels (candidate root
    particle ids, invariant lab_p[i] <= i). One round = scatter labels
    into the cell lattice, min-propagate over the 27-stencil (hook),
    gather back, pointer-jump to convergence (compress). Returns
    (new lab_p, changed?). The caller loops rounds on the HOST: a
    `while_loop` over hooks compiles into one device program whose
    runtime scales as rounds x lattice work -- minutes at 1M clustered,
    which the axon TPU watchdog kills (round-2 crash). One bounded
    program per round + a scalar readback is robust and costs ~ms.

    Returns (new lab_p, changed?, active_next): `active_next` is the
    int32 [C] per-CELL mask for the NEXT round -- the 27-dilation of
    every cell whose labels changed this round. The pallas hook skips
    inactive cells' z-planes (and whole inactive rods); late-round
    activity is sparse-but-uniform background percolation chains, so
    the skip has to live at cell granularity (rod-level skipping
    measured <5% savings; cell-level collapses the per-round cost to
    O(active fraction) + the rod DMA floor).
    """
    n = lab_p.shape[0]
    k = capacity
    ncells = ncell ** 3
    big = jnp.int32(n)
    safe_slot = jnp.maximum(pslot, 0)

    def _active_next(lab2):
        # cells whose labels changed, 27-dilated -> per-CELL mask [C]
        changed_p = (lab2 != lab_p) & (pslot >= 0)
        ch_cell = jnp.zeros((ncells,), bool) \
            .at[safe_slot // k].max(changed_p)
        ch3 = ch_cell.reshape(ncell, ncell, ncell)
        for ax in range(3):
            ch3 = ch3 | jnp.roll(ch3, 1, ax) | jnp.roll(ch3, -1, ax)
        return ch3.reshape(-1).astype(jnp.int32)

    if hook in ("pallas", "pallas_interpret"):
        # occupancy-aware Pallas Gauss-Seidel sweep (ops/pallas_fof):
        # labels ride in their own int32 plane (any N); only live
        # i-rows are visited; inactive rods are skipped
        from ..ops.pallas_fof import pallas_fof_hook
        slot_lab = jnp.full((ncells * k,), big, jnp.int32)
        slot_lab = slot_lab.at[safe_slot].min(
            jnp.where(pslot >= 0, lab_p, big))
        hooked2 = pallas_fof_hook(
            bxyz[0], bxyz[1], bxyz[2], slot_lab.reshape(ncells, k),
            counts, ncell=ncell, capacity=k, n_sentinel=n,
            box_size=box_size, linking_length=linking_length,
            interpret=(hook == "pallas_interpret"), reverse=reverse,
            # in-rod bidirectional z (ops/pallas_fof): both z
            # directions per rod visit at zero extra DMA -- measured
            # to cut global rounds ~2x on clustered boxes
            bidirectional=True,
            active=active)
        hooked = hooked2.reshape(ncells * k)
        lab1 = jnp.where(pslot >= 0,
                         jnp.minimum(lab_p, hooked[safe_slot]), lab_p)
        lab2, changed = _fof_compress(lab1, lab_p)
        return lab2, changed, _active_next(lab2)

    # particle labels -> slot lattice (empty slots carry `big`)
    slot_lab = jnp.full((ncells * k,), big, jnp.int32)
    slot_lab = slot_lab.at[safe_slot].min(
        jnp.where(pslot >= 0, lab_p, big))

    bp3 = [b.reshape(ncell, ncell, ncell, k) for b in bxyz]
    occ = occupied.reshape(ncell, ncell, ncell, k)
    lab3 = slot_lab.reshape(ncell, ncell, ncell, k)
    b2 = linking_length * linking_length
    rows = ncell * ncell
    bp_r = [b.reshape(rows, ncell, k) for b in bp3]
    occ_r = occ.reshape(rows, ncell, k)
    # chunk the neighbor (j) slot axis so pair temporaries stay
    # [nc, K, jc] regardless of capacity (K=1024 direct calls would
    # otherwise build 27 x 134MB+ temporaries per shift)
    jc = min(k, 256)
    # exact periodic image offset per lattice site: rolling the lattice
    # by (ox,oy,oz) wraps only the boundary planes, and the wrapped
    # plane's true displacement differs by exactly +-box along that
    # axis. Adding box*((coord+shift)//ncell) to the rolled positions
    # makes plain differences exact -- cells are axis-aligned, so unlike
    # the direct kernel's per-tile image anchor this is NOT an
    # approximation, and it deletes the per-PAIR min_image (6 ops/pair).
    iota = jnp.arange(ncell, dtype=jnp.int32)

    dtype = bxyz[0].dtype
    shifts = _NEIGHBOR_SHIFTS[::-1] if reverse else _NEIGHBOR_SHIFTS
    shifts_arr = jnp.asarray(shifts, jnp.int32)           # [27, 3]

    # The 27 neighbor shifts run as a lax.scan with TRACED roll
    # amounts, not an unrolled Python loop: unrolled, the shifts'
    # independent rolled copies (which do not data-depend on the
    # Gauss-Seidel carry) get hoisted together by XLA's scheduler —
    # ~25 lattice-sized 512 MB temps live at once, a 29.75 GB HLO-temp
    # OOM at the 64^3 x 512 z=0 flagship plan (round 5) — and the
    # 27x-unrolled body is itself a multi-minute remote compile. The
    # scan compiles ONE body and bounds live temps to one shift's
    # working set (~5 GB at the same plan). jnp.roll with traced
    # shifts lowers to the same concat+slice data movement as the
    # static form. Gauss-Seidel semantics preserved: the carry is the
    # partially-updated lattice.
    def one_shift(new, sh):
        ox, oy, oz = sh[0], sh[1], sh[2]
        off = [jnp.asarray(box_size, dtype)
               * ((iota + s) // ncell).astype(dtype)
               for s in (ox, oy, oz)]
        # per-axis wrap offsets live on the matching lattice axes
        osh = [(ncell, 1, 1, 1), (1, ncell, 1, 1), (1, 1, ncell, 1)]
        nb_p = [
            (jnp.roll(bp3[c], (-ox, -oy, -oz), axis=(0, 1, 2))
             + off[c].reshape(osh[c])).reshape(rows, ncell, k)
            for c in range(3)]
        # Gauss-Seidel: read neighbor labels from the PARTIALLY-UPDATED
        # lattice (earlier shifts' mins propagate within the round) --
        # min-propagation is monotone, so any stale/fresh mix converges
        # to the same fixpoint, and fresher reads converge in fewer
        # rounds at zero extra cost (a roll happens either way)
        nb_lab = jnp.roll(new, (-ox, -oy, -oz), axis=(0, 1, 2)) \
            .reshape(rows, ncell, k)
        nb_occ = jnp.roll(occ, (-ox, -oy, -oz), axis=(0, 1, 2)) \
            .reshape(rows, ncell, k)
        cur = new.reshape(rows, ncell, k)

        def row(carry, xs):
            cpx, cpy, cpz, co, cl, npx, npy, npz, nlab, nocc = xs
            out = cl
            for j0 in range(0, k, jc):
                je = min(j0 + jc, k)
                r2 = jnp.zeros((ncell, k, je - j0), jnp.float32)
                for cp, np_ in ((cpx, npx), (cpy, npy), (cpz, npz)):
                    d = np_[:, j0:je][:, None, :] - cp[:, :, None]
                    r2 += d * d
                linked = ((r2 < b2) & nocc[:, j0:je][:, None, :]
                          & co[:, :, None])
                cand = jnp.where(linked, nlab[:, j0:je][:, None, :], big)
                out = jnp.minimum(out, jnp.min(cand, axis=-1))
            return carry, out

        _, upd = jax.lax.scan(
            row, None, (bp_r[0], bp_r[1], bp_r[2], occ_r, cur,
                        nb_p[0], nb_p[1], nb_p[2], nb_lab, nb_occ))
        return upd.reshape(ncell, ncell, ncell, k), None

    new, _ = jax.lax.scan(one_shift, lab3, shifts_arr)

    # back to particle space; capacity-overflow particles (pslot < 0)
    # keep their current label here (they adopt the cell anchor at
    # finalize)
    hooked = new.reshape(ncells * k)
    lab1 = jnp.where(pslot >= 0,
                     jnp.minimum(lab_p, hooked[safe_slot]), lab_p)
    lab2, changed = _fof_compress(lab1, lab_p)
    # the jnp lattice hook has no skipping, so the dilated changed-cell
    # mask has no consumer on this path -- pass the incoming mask
    # through unchanged rather than paying a full-lattice scatter +
    # 27-dilation per round that XLA cannot DCE (it is an output)
    return lab2, changed, active


def _fof_compress(lab1, lab_prev):
    """Pointer-jump compression on the [N] particle array (lab[i] <= i
    so chains strictly descend; bounded gathers, converges ~log).
    Returns (compressed labels, changed-vs-lab_prev?)."""
    def cond(st):
        lab, prev, i = st
        return (i < 16) & jnp.any(lab != prev)

    def body(st):
        lab, _, i = st
        return lab[lab], lab, i + 1

    lab2, _, _ = jax.lax.while_loop(cond, body,
                                    (lab1[lab1], lab1, jnp.int32(0)))
    return lab2, jnp.any(lab2 != lab_prev)


@partial(jax.jit, static_argnames=("ncell", "capacity"))
def _fof_adopt_overflow(lab_p, pslot, slot_particle, live, positions,
                        box_size, *, ncell: int, capacity: int):
    """Capacity-overflow particles (dense halo-core cells, occupancy >
    capacity) merge into their own cell's group via the cell's slot-0
    anchor particle: a cell that overflows a sane capacity is orders of
    magnitude above the linking density, so standard FoF would link its
    contents anyway -- the approximation is COUNTED (`overflow`),
    bounding memory at [ncell^3, capacity] instead of sizing every cell
    for the densest core."""
    n = lab_p.shape[0]
    cell = jnp.clip(jnp.floor(positions / box_size * ncell).astype(
        jnp.int32), 0, ncell - 1)
    cid = (cell[:, 0] * ncell + cell[:, 1]) * ncell + cell[:, 2]
    anchor = slot_particle[cid * capacity]    # own cell's slot-0 owner
    anchor = jnp.minimum(anchor, n - 1)       # (full cell => occupied)
    # dead padding rows keep their self-label (field singletons)
    return jnp.where(pslot >= 0, lab_p,
                     jnp.where(live, lab_p[anchor], lab_p))


def fof_labels(positions, box_size, linking_length, *, ncell: int,
               capacity: int, max_rounds: int = 64, live=None,
               hook: str = "auto"):
    """Connected components under the FoF relation |xi - xj| < b.

    Returns (label [N] int32 = root particle index per group, overflow).
    Algorithm: bucket particles into cells of size >= b; repeat
    { hook: label_i <- min over 27-stencil neighbors within b;
      compress: label <- label[label] (pointer jumping) } until fixpoint.
    Labels live in PARTICLE space throughout (the round-1 slot-space
    compression gathered over the full [C*K] padded lattice -- 134M
    slots at production plans). Host-side round loop; see _fof_round.
    `live` (bool [N], default all) excludes zero-mass padding rows:
    they come back as field singletons.
    `hook`: "auto" (occupancy-aware Pallas sweep on TPU, jnp lattice
    elsewhere), "jnp", "pallas", or "pallas_interpret" (kernel under
    the Pallas interpreter, for CPU validation).
    """
    n = positions.shape[0]
    if live is None:
        live = jnp.ones((n,), bool)
    if hook == "auto":
        # capacity must be a whole number of 128-lane tiles: the kernel
        # slices jrow at lane offsets that are multiples of capacity.
        # ncell <= 32: the hook fully unrolls its z planes -- at 64^3
        # the Mosaic compile itself dies (z=0 clustered 64k exposed it);
        # 32^3 x 1024 is the proven production shape (1M clustered)
        hook = ("pallas" if (jax.default_backend() == "tpu"
                             and 3 <= ncell <= 32
                             and capacity % 128 == 0) else "jnp")
    bxyz, occupied, counts, pslot, slot_particle, overflow = _fof_setup(
        positions, live, box_size, ncell, capacity)
    lab = jnp.arange(n, dtype=jnp.int32)
    active = jnp.ones((ncell ** 3,), jnp.int32)
    import logging as _logging
    import time as _time
    _log = _logging.getLogger("lambda_cdm_tpu")
    for r in range(max_rounds):
        # alternate the Gauss-Seidel sweep direction per round so labels
        # propagate both ways along the sweep order (a forward-only
        # sweep moves -direction links only one cell per round)
        _t0 = _time.perf_counter()
        lab, changed, active = _fof_round(
            lab, bxyz, occupied, counts, pslot,
            box_size=float(box_size),
            linking_length=float(linking_length),
            ncell=ncell, capacity=capacity, hook=hook,
            reverse=bool(r % 2), active=active)
        ch = bool(changed)   # scalar readback = per-round sync point
        _log.info("fof round %d (%s): %.2f s%s", r, hook,
                  _time.perf_counter() - _t0,
                  "" if ch else " (converged)")
        if not ch:
            break
    lab = _fof_adopt_overflow(lab, pslot, slot_particle, live, positions,
                              box_size, ncell=ncell, capacity=capacity)
    return lab, overflow


_FOF_CAPS = (16, 32, 64, 128, 256, 512, 1024)


def fof_plan(num_particles: int, box_size: float, linking_length: float,
             capacity: int = 0, positions=None,
             max_capacity: int = 1024,
             memory_budget_bytes: int = 2 << 30, live=None) -> dict:
    """Cell geometry for FoF (cells of size >= linking length).

    Unlike the force solvers (uniform-ish occupancy), FoF runs on
    *clustered* data where a single cell can hold a whole halo core.
    Any cell size >= b is correct (the 27-stencil covers all links), so
    pick the cheapest padded layout -- work = 27 x ncell^3 x capacity^2
    -- subject to two validity constraints per level: (i) merged-cell
    overflow at the chosen capacity stays negligible (<0.1% of
    particles; a capped coarse lattice otherwise over-merges the box
    into garbage mega-groups), (ii) the [ncell^3, capacity] layout fits
    `memory_budget_bytes` at 16 B/slot (with ~2x transient headroom for
    the rolled neighbor copy -- unbudgeted fine lattices wedged the
    16 GB v5e at 1M clustered). Note finer is NOT automatically
    cheaper: capacity is bounded below by the densest cell, so
    refining past the clustering scale multiplies cells without
    shrinking capacity. Fall back to least-overflow if no level
    qualifies (extreme cores -- overflow stays counted by fof_labels).
    Occupancy for every level comes from ONE device pass: counts at the
    finest lattice, pooled 2x per level (floor binning at ncell/2 ==
    2^3-sum of ncell bins). The round-2 per-level recompiling scan took
    70 s of compiles alone.
    """
    # cells must stay >= b for the 27-stencil to cover all links; do NOT
    # clamp nmax up (cells < b silently drop real links -- for b >
    # box/4 the correct lattice is 1-3 cells across, which the hook
    # handles: min-propagation is idempotent, so the degenerate rolls
    # that alias neighbors on tiny lattices cannot double-count)
    nmax = max(min(int(math.floor(box_size / linking_length)), 128), 1)
    nf = 1 << (nmax.bit_length() - 1)         # finest power-of-2 level
    if capacity > 0:
        return {"ncell": nf, "capacity": capacity}
    caps = tuple(c for c in _FOF_CAPS if c <= max_capacity) or (16,)

    def cap_from_budget(ncell):
        cap = 16
        for c in caps:
            if 16 * ncell ** 3 * c <= memory_budget_bytes:
                cap = c
        return cap

    if positions is None:
        # no occupancy information: finest lattice, generous headroom
        mean_occ = num_particles / max(nf ** 3, 1)
        cap = int(max(16, math.ceil(8.0 * mean_occ)))
        cap = min(((cap + 7) // 8) * 8, max_capacity, cap_from_budget(nf))
        return {"ncell": nf, "capacity": cap}

    if live is None:
        live = jnp.ones((positions.shape[0],), bool)
    stats = jax.device_get(
        _occupancy_pyramid(positions, live, box_size, nf, caps))
    n = num_particles
    best_ok = None
    best_any = None
    kernel_caps = (jax.default_backend() == "tpu")
    for lvl, ncell in enumerate(_pyramid_levels(nf)):
        max_occ = int(stats[lvl][0])
        ovf_tab = stats[lvl][1]
        nonempty = int(stats[lvl][2])
        cap_occ = max(16, 1 << (max(max_occ, 1) - 1).bit_length())
        # consider EVERY tabulated capacity <= the occupancy bound: a
        # deliberately smaller capacity that overflows only a handful of
        # extreme core cells often wins the work race outright (e.g.
        # 64^3 x 256 with 0.05% merged beats 32^3 x 1024 exact by 2x)
        for cap in caps:
            if cap > cap_occ or cap > max_capacity:
                break
            if 16 * ncell ** 3 * cap > memory_budget_bytes:
                continue                      # too fine for the budget
            ovf = 0 if cap >= max_occ else int(ovf_tab[caps.index(cap)])
            if kernel_caps and cap % 128 == 0 and 3 <= ncell <= 32:
                # occupancy-aware Pallas hook: only live i rows are
                # visited, in 16-row chunks -> pair work ~
                # 27*cap*(n + chunk padding), independent of ncell^3.
                # ncell <= 32: the hook's unrolled z planes fail to
                # compile at 64^3 (fof_labels gates identically)
                work = 27 * cap * (n + 16 * nonempty)
            else:
                # jnp lattice hook grinds every padded slot pair
                work = 27 * ncell ** 3 * cap * cap
            if ovf <= max(1, n // 1000):
                if best_ok is None or work < best_ok[0]:
                    best_ok = (work, ncell, cap)
            if best_any is None or (ovf, work) < best_any[:2]:
                best_any = (ovf, work, ncell, cap)
    if best_ok is not None:
        _, ncell, capacity = best_ok
    else:
        _, _, ncell, capacity = best_any
    return {"ncell": ncell, "capacity": capacity}


def _pyramid_levels(nf: int):
    levels = []
    ncell = nf
    while ncell >= 1:
        levels.append(ncell)
        if ncell == 1:
            break
        ncell //= 2
    return levels


@partial(jax.jit, static_argnames=("nf", "caps"))
def _occupancy_pyramid(positions, live, box_size, nf: int, caps: tuple):
    """Per level ncell = nf, nf/2, ..., 1: (max cell occupancy,
    [particles beyond cap summed over cells, for cap in caps],
    number of non-empty cells).
    Dead rows (zero-mass padding) are dropped via an out-of-range id."""
    cell = jnp.clip(jnp.floor(positions / box_size * nf).astype(
        jnp.int32), 0, nf - 1)
    cid = (cell[:, 0] * nf + cell[:, 1]) * nf + cell[:, 2]
    cid = jnp.where(live, cid, nf ** 3)       # segment_sum drops these
    counts = jax.ops.segment_sum(
        jnp.ones_like(cid), cid, num_segments=nf ** 3).reshape(nf, nf, nf)
    out = []
    for ncell in _pyramid_levels(nf):
        if ncell != nf:
            counts = counts.reshape(ncell, 2, ncell, 2, ncell, 2) \
                .sum(axis=(1, 3, 5))
        ovf = jnp.stack([jnp.sum(jnp.maximum(counts - c, 0))
                         for c in caps])
        out.append((jnp.max(counts), ovf, jnp.sum(counts > 0)))
    return out


# ---------------------------------------------------------------------------
# Halo catalog
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("box",))
def _window_occupancy(pos, lv, box):
    """Pooled live-cell occupancy maxima at nc = 32/16/8 (one pass)."""
    cell = jnp.clip(jnp.floor(pos / box * 32).astype(jnp.int32), 0, 31)
    cid = (cell[:, 0] * 32 + cell[:, 1]) * 32 + cell[:, 2]
    c32 = jnp.zeros((32 ** 3,), jnp.int32).at[cid].add(
        jnp.where(lv, 1, 0))
    c32 = c32.reshape(32, 32, 32)
    c16 = c32.reshape(16, 2, 16, 2, 16, 2).sum((1, 3, 5))
    c8 = c16.reshape(8, 2, 8, 2, 8, 2).sum((1, 3, 5))
    return jnp.max(c32), jnp.max(c16), jnp.max(c8)


def catalog_window_plan(positions, box_size, *, live=None, r_max=None,
                        mem_budget_mb: int = 768):
    """Host-side plan for catalog_from_labels' windowed profiles:
    -> (ncell, capacity, pad) static tuple, or None (exact scan).

    One device pass: live cell counts at nc=32 pooled down to 16 and 8;
    capacity = the actual max occupancy (so the window buckets hold
    every particle -- nothing is ever dropped), memory-bounded, and the
    smallest per-halo window work wins. Mirrors fof_plan's pooled
    occupancy pyramid (same planning stance, coarser levels)."""
    box = float(box_size)
    if r_max is None:
        r_max = 0.1 * box
    n = positions.shape[0]
    lv = jnp.ones((n,), bool) if live is None else live
    # module-level jit: a per-call closure would re-trace + re-compile
    # the occupancy pass on every catalog/find_halos invocation
    m32, m16, m8 = (int(x) for x in _window_occupancy(positions, lv, box))
    best = None
    for nc, mx in ((32, m32), (16, m16), (8, m8)):
        pad = int(math.ceil(r_max * nc / box))
        if 2 * pad + 1 > nc:
            # window wider than the box: wrapped copies would double
            # count
            continue
        cap = max(128, -(-(mx + 1) // 128) * 128)
        mem = 8 * (nc + 2 * pad) ** 3 * cap * 4
        if mem > mem_budget_mb * 1024 * 1024:
            continue
        work = (2 * pad + 1) ** 3 * cap
        if work >= n:           # no cheaper than the exact scan
            continue
        if best is None or work < best[0]:
            best = (work, nc, cap, pad)
    return None if best is None else (best[1], best[2], best[3])


@partial(jax.jit, static_argnames=("max_halos", "min_particles",
                                   "window"))
def catalog_from_labels(positions, velocities, masses, labels, box_size,
                        *, max_halos: int = 256, min_particles: int = 20,
                        overdensity: float = 200.0, mean_density=None,
                        g_const: float = 43.0071057317063,
                        window: tuple | None = None):
    """Segment-reduce particle groups into a HaloCatalog
    (reference: extract_halos + compute properties,
    halo_finder.cpp:213-337).

    `window` = (ncell, capacity, pad) from `catalog_window_plan`
    switches the per-halo SO/vmax/L profiles from the exact O(N*H)
    scan to bucketed windows of (2*pad+1)^3 cells around each center
    (pad*cell >= r_max, so every particle within r_max is seen). The
    plan sizes capacity at the max cell occupancy, so no particle is
    dropped; FoF members beyond r_max contribute to angular momentum
    only on the exact path (windowed L is the within-r_max L)."""
    n = positions.shape[0]
    # Scatter-free label reductions: sort by label once, then every
    # per-group sum is a cumsum difference at run boundaries.  TPU
    # scatters run ~8x slower than sort+gather (forces/treepm.
    # bucket_src_map measurement); the old label-space segment_sums
    # scattered ~11M elements per catalog call.
    order = jnp.argsort(labels)
    lab_s = labels[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    brk = lab_s[1:] != lab_s[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), brk])
    is_end = jnp.concatenate([brk, jnp.ones((1,), bool)])
    first = jax.lax.cummax(jnp.where(is_start, idx, 0))
    # nearest end at-or-after each row, via a flipped cummax
    last = (n - 1) - jnp.flip(jax.lax.cummax(
        jnp.flip(jnp.where(is_end, (n - 1) - idx, 0))))
    counts_row = last - first + 1          # [N] = own group's size

    # periodic-safe CoM: average unit-circle phases per axis
    m_s = masses[order]
    theta_s = positions[order] / box_size * (2.0 * jnp.pi)
    chan = jnp.concatenate([
        m_s[:, None],
        m_s[:, None] * jnp.cos(theta_s),
        m_s[:, None] * jnp.sin(theta_s),
        m_s[:, None] * velocities[order],
    ], axis=1)                             # [N, 10]
    # SEGMENTED cumsum (resets at run starts): a plain global cumsum
    # quantizes every per-group difference at ulp(global prefix) --
    # ~ulp(1e7) = 1.0 in f32 at 10M unit masses, i.e. several-% errors
    # on min_particles-sized halos. Keeping accumulation within each
    # run bounds the error by ulp(group sum), matching the old
    # segment_sum precision at sort+scan cost (no scatters).

    def _seg_combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf[:, None], bv, av + bv), af | bf

    cum, _ = jax.lax.associative_scan(_seg_combine, (chan, is_start))

    # rank halos by particle count (one candidate per group: its start)
    score = jnp.where(is_start & (counts_row >= min_particles),
                      counts_row, 0)
    k = min(max_halos, n)
    top_counts, sel = jax.lax.top_k(score, k)
    if k < max_halos:
        top_counts = jnp.pad(top_counts, (0, max_halos - k))
        sel = jnp.pad(sel, (0, max_halos - k))
    valid = top_counts >= min_particles
    num_halos = jnp.sum(valid.astype(jnp.int32))

    sel_safe = jnp.where(valid, sel, 0)
    top_roots = lab_s[sel_safe]
    # the segmented cumsum restarts at each run, so its value at the
    # run's last row IS the group sum
    run_sum = cum[last[sel_safe]]
    msum_h, cx_h, sx_h, vsum_h = (run_sum[:, 0], run_sum[:, 1:4],
                                  run_sum[:, 4:7], run_sum[:, 7:10])
    ang = jnp.arctan2(sx_h, cx_h)
    h_com = jnp.where(valid[:, None],
                      jnp.mod(ang / (2.0 * jnp.pi), 1.0) * box_size, 0.0)
    h_mass = jnp.where(valid, msum_h, 0.0)
    h_vel = jnp.where(valid[:, None],
                      vsum_h / jnp.maximum(msum_h[:, None], 1e-30), 0.0)

    # per-particle halo id (index into the catalog) for membership ops;
    # invalid slots scatter into the dump index n (never index 0 -- a real
    # halo can be rooted at particle 0)
    scatter_roots = jnp.where(valid, top_roots, n)
    halo_of_root = jnp.full((n + 1,), -1, jnp.int32)
    halo_of_root = halo_of_root.at[scatter_roots].set(
        jnp.arange(max_halos, dtype=jnp.int32))
    halo_of_root = halo_of_root.at[n].set(-1)
    plabel = halo_of_root[jnp.minimum(labels, n)]

    # SO radius + vmax + angular momentum per halo (vectorized over halos
    # via radial mass histograms)
    nbins = 64
    if mean_density is None:
        mean_density = jnp.sum(masses) / box_size ** 3
    r_max = 0.1 * box_size
    edges = jnp.linspace(0.0, r_max, nbins + 1)[1:]      # bin upper edges

    def profile_tail(hist, d, rel_v, w_mass, member):
        """(radial mass hist, offsets, rel. velocities, masses, member
        mask) -> (r_delta, m_delta, v_max, L). Shared by the exact and
        windowed paths."""
        m_enc = jnp.cumsum(hist)
        vol = 4.0 / 3.0 * jnp.pi * edges ** 3
        dens = m_enc / vol
        # largest radius with enclosed density >= Delta * rho_bar ...
        thr = overdensity * mean_density
        above = dens >= thr
        j = jnp.max(jnp.where(above, jnp.arange(nbins), -1))
        has = j >= 0
        jsafe = jnp.clip(j, 0, nbins - 1)
        # ... then solve the crossing INSIDE the bracketing bin: with
        # enclosed mass linear in x = r^3 across the bin, M(x) = thr *
        # (4pi/3) x is linear too -> closed form (the continuous
        # analogue of the reference's bisection refinement,
        # halo_finder.cpp:364-444; bin-edge quantization was 0.16 Mpc)
        nxt = jnp.minimum(jsafe + 1, nbins - 1)
        x0 = edges[jsafe] ** 3
        x1 = edges[nxt] ** 3
        m0 = m_enc[jsafe]
        s = (m_enc[nxt] - m0) / jnp.maximum(x1 - x0, 1e-30)
        c = 4.0 / 3.0 * jnp.pi * thr
        denom = jnp.where(jnp.abs(c - s) > 1e-30, c - s, 1e-30)
        x = jnp.clip((m0 - s * x0) / denom, x0, x1)
        interior = has & (j < nbins - 1)
        r_delta = jnp.where(interior, jnp.cbrt(x),
                            jnp.where(has, edges[jsafe], 0.0))
        m_delta = jnp.where(interior, c * x,
                            jnp.where(has, m0, 0.0))
        v_circ2 = g_const * m_enc / jnp.maximum(edges, 1e-8)
        v_max = jnp.sqrt(jnp.max(jnp.where(edges <= jnp.maximum(
            r_delta, edges[0]), v_circ2, 0.0)))
        ell = jnp.cross(d, rel_v) * w_mass[:, None]
        ell = jnp.sum(jnp.where(member[:, None], ell, 0.0), axis=0)
        return r_delta, m_delta, v_max, ell

    def halo_profile(idx):
        center = h_com[idx]
        d = min_image(positions - center[None, :], box_size)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        bin_idx = jnp.clip((r / r_max * nbins).astype(jnp.int32), 0,
                           nbins - 1)
        # particles beyond r_max must NOT land in the outermost bin:
        # clipping them in puts the whole box's mass into m_enc's last
        # entry, and box^3 / (4/3 pi r_max^3) = 238.7 > Delta=200 means
        # dens[last] >= Delta*rho_bar ALWAYS -> every halo reported
        # r_delta == r_max (round-2 bug, caught by the analytic SO test)
        hist = jax.ops.segment_sum(jnp.where(r < r_max, masses, 0.0),
                                   bin_idx, num_segments=nbins)
        return profile_tail(hist, d, velocities - h_vel[idx][None, :],
                            masses, plabel == idx)

    def make_windowed_profile():
        """Bucket once; per halo, dynamic-slice a (2p+1)^3-cell window
        around the center -- O(window) work instead of O(N) per halo."""
        nc_w, cap_w, p_w = window
        w_sz = 2 * p_w + 1
        cell_w = box_size / nc_w
        src, _, _, _, w_overflow = bucket_src_map(
            positions, jnp.where(masses > 0, 1.0, 0.0).astype(
                positions.dtype), box_size, ncell=nc_w, capacity=cap_w)

        def chan(x, fill=0.0):
            return bucket_gather(x, src, fill).reshape(
                nc_w, nc_w, nc_w, cap_w)

        fc = jnp.stack([chan(positions[:, 0]), chan(positions[:, 1]),
                        chan(positions[:, 2]), chan(masses),
                        chan(velocities[:, 0]), chan(velocities[:, 1]),
                        chan(velocities[:, 2])])
        pw = ((0, 0),) + ((p_w, p_w),) * 3 + ((0, 0),)
        fc = jnp.pad(fc, pw, mode="wrap")
        pl_pad = jnp.pad(chan(plabel, -1), pw[1:], mode="wrap")

        def halo_profile_w(idx):
            center = h_com[idx]
            base = jnp.clip(jnp.floor(center / cell_w).astype(jnp.int32),
                            0, nc_w - 1)
            win = jax.lax.dynamic_slice(
                fc, (0, base[0], base[1], base[2], 0),
                (7, w_sz, w_sz, w_sz, cap_w)).reshape(7, -1)
            pl_w = jax.lax.dynamic_slice(
                pl_pad, (base[0], base[1], base[2], 0),
                (w_sz, w_sz, w_sz, cap_w)).reshape(-1)
            wpos = jnp.stack([win[0], win[1], win[2]], axis=-1)
            w_mass = win[3]
            d = min_image(wpos - center[None, :], box_size)
            r = jnp.sqrt(jnp.sum(d * d, axis=-1))
            live_w = w_mass > 0
            bin_idx = jnp.clip((r / r_max * nbins).astype(jnp.int32),
                               0, nbins - 1)
            hist = jax.ops.segment_sum(
                jnp.where(live_w & (r < r_max), w_mass, 0.0), bin_idx,
                num_segments=nbins)
            rel_v = (jnp.stack([win[4], win[5], win[6]], axis=-1)
                     - h_vel[idx][None, :])
            return profile_tail(hist, d, rel_v, w_mass,
                                (pl_w == idx) & live_w)

        return halo_profile_w, w_overflow

    if window is not None:
        profile_fn, prof_dropped = make_windowed_profile()
    else:
        profile_fn, prof_dropped = halo_profile, jnp.int32(0)
    r_delta, m_delta, v_max, ell = jax.lax.map(
        profile_fn, jnp.arange(max_halos))
    r_delta = jnp.where(valid, r_delta, 0.0)
    v_max = jnp.where(valid, v_max, 0.0)
    ell = jnp.where(valid[:, None], ell, 0.0)

    # Peebles spin: lambda = L sqrt(|E|) / (G M^(5/2)); use the common
    # Bullock form lambda' = L / (sqrt(2) M V_delta R_delta)
    v_delta = jnp.sqrt(g_const * jnp.maximum(m_delta, 1e-30)
                       / jnp.maximum(r_delta, 1e-8))
    l_mag = jnp.sqrt(jnp.sum(ell * ell, axis=-1))
    spin = jnp.where(
        valid & (r_delta > 0),
        l_mag / (jnp.sqrt(2.0) * jnp.maximum(h_mass, 1e-30)
                 * v_delta * jnp.maximum(r_delta, 1e-8)),
        0.0)

    return HaloCatalog(
        num_halos=num_halos,
        n_particles=jnp.where(valid, top_counts, 0),
        center=h_com, velocity=h_vel, mass=h_mass,
        radius=r_delta, v_max=v_max,
        angular_momentum=ell, spin=spin,
        particle_label=plabel,
        profile_dropped=jnp.asarray(prof_dropped, jnp.int32))


@partial(jax.jit, static_argnames=("min_particles",))
def count_groups(labels, min_particles: int = 20):
    """Number of FoF groups with >= min_particles members (one sorted
    run-length pass; the exact catalog size, so auto-sized catalogs
    never truncate)."""
    n = labels.shape[0]
    lab_s = jnp.sort(labels)
    idx = jnp.arange(n, dtype=jnp.int32)
    brk = lab_s[1:] != lab_s[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), brk])
    is_end = jnp.concatenate([brk, jnp.ones((1,), bool)])
    first = jax.lax.cummax(jnp.where(is_start, idx, 0))
    last = (n - 1) - jnp.flip(jax.lax.cummax(
        jnp.flip(jnp.where(is_end, (n - 1) - idx, 0))))
    counts = last - first + 1
    return jnp.sum((is_start & (counts >= min_particles)).astype(
        jnp.int32))


def find_halos(positions, velocities, masses, box_size, *,
               linking_length_factor: float = 0.2,
               min_particles: int = 20, max_halos: int | None = None,
               overdensity: float = 200.0,
               g_const: float = 43.0071057317063,
               n_slabs: int = 0, plan: dict | None = None,
               hook: str = "auto",
               windowed: bool | None = None) -> HaloCatalog:
    """One-call FoF + SO catalog (reference:
    FriendsOfFriends::find_halos, halo_finder.cpp:15-45).

    linking_length = factor * mean interparticle separation (b=0.2
    standard, the reference's default). `n_slabs > 1` routes the
    labeling through fof_labels_slabwise (memory O(N/n_slabs) on the
    device per slab pass; identical labels).

    `max_halos=None` (default) auto-sizes the catalog from the exact
    qualifying-group count, rounded up to a power of two (>= 256) to
    bucket recompiles -- a measured mass function is never silently
    truncated at its low-mass end (the reference extracts EVERY group
    >= min_particles, halo_finder.cpp:339-361). An explicit cap that
    binds logs a warning with the true group count.
    """
    n = positions.shape[0]
    b = linking_length_factor * box_size / n ** (1.0 / 3.0)
    if plan is None:
        plan = fof_plan(n, float(box_size), float(b),
                        positions=positions, live=masses > 0)
    # explicit `plan` = {"ncell", "capacity"} overrides the auto plan:
    # deliberately capping a clustered state below its densest core
    # routes the over-cap residents through the merged-cell adoption
    # (_fof_adopt_overflow — cells that overflow a sane capacity are far
    # above the linking density, so plain FoF links their contents
    # anyway) and keeps the labeling on the Pallas hook's geometry
    # envelope (ncell <= 32) when the exact plan's jnp-lattice compile
    # is too big for the remote compiler.
    if n_slabs > 1:
        labels, overflow = fof_labels_slabwise(
            positions, box_size, b, n_slabs=n_slabs,
            ncell=plan["ncell"], capacity=plan["capacity"],
            live=masses > 0, hook=hook)
    else:
        labels, overflow = fof_labels(
            positions, box_size, b, ncell=plan["ncell"],
            capacity=plan["capacity"], live=masses > 0, hook=hook)
    import logging as _logging
    _log = _logging.getLogger("lambda_cdm_tpu")
    _log.info("find_halos: labels done (overflow=%d); counting groups",
              int(overflow))
    n_groups = int(count_groups(labels, min_particles=min_particles))
    _log.info("find_halos: %d groups >= %d particles; building catalog",
              n_groups, min_particles)
    if max_halos is None:
        max_halos = max(256, 1 << max(n_groups - 1, 0).bit_length())
    elif n_groups > max_halos:
        import logging
        logging.getLogger("lambda_cdm_tpu").warning(
            "halo catalog: %d groups have >= %d particles but "
            "max_halos=%d -- the catalog keeps only the %d most massive "
            "(pass max_halos=None to auto-size)",
            n_groups, min_particles, max_halos, max_halos)
    # `windowed` False forces the exact O(N)-per-halo profile path —
    # a simpler program than the bucketed-window one (whose execution
    # has been observed to hang on the tunnel-attached TPU at the 1M
    # z=0 geometry; the exact path is ~46 ms/halo of segment_sum there)
    if windowed is None:
        windowed = n >= 200_000
    window = (catalog_window_plan(positions, box_size, live=masses > 0)
              if windowed else None)
    cat = catalog_from_labels(
        positions, velocities, masses, labels, box_size,
        max_halos=max_halos, min_particles=min_particles,
        overdensity=overdensity, g_const=g_const, window=window)
    if cat.profile_dropped is not None and int(cat.profile_dropped) > 0:
        # cannot happen when the window was planned on these positions
        # (capacity = true max occupancy); guards stale/hand-built plans
        import logging
        logging.getLogger("lambda_cdm_tpu").warning(
            "halo catalog: %d particles exceeded the profile window "
            "capacity and are missing from SO/vmax/L profiles",
            int(cat.profile_dropped))
    return cat


def mass_function(catalog: HaloCatalog, box_size, num_bins: int = 16,
                  m_min=None, m_max=None):
    """dn/dlog10(M) [(Mpc/h)^-3] from the catalog (reference:
    compute_mass_function, halo_finder.cpp:339-361)."""
    m = catalog.mass
    valid = m > 0
    m_min = jnp.min(jnp.where(valid, m, jnp.inf)) if m_min is None else m_min
    m_max = jnp.max(m) if m_max is None else m_max
    lo, hi = jnp.log10(m_min), jnp.log10(m_max * (1 + 1e-6))
    edges = jnp.linspace(lo, hi, num_bins + 1)
    idx = jnp.clip(((jnp.log10(jnp.maximum(m, 1e-30)) - lo) / (hi - lo)
                    * num_bins).astype(jnp.int32), 0, num_bins - 1)
    counts = jax.ops.segment_sum(valid.astype(jnp.float32), idx,
                                 num_segments=num_bins)
    dlog = (hi - lo) / num_bins
    centers = 10.0 ** (0.5 * (edges[1:] + edges[:-1]))
    volume = box_size ** 3
    return centers, counts / (volume * dlog), counts


def fof_labels_slabwise(positions, box_size, linking_length, *,
                        n_slabs: int, ncell: int, capacity: int,
                        live=None, max_rounds: int = 64,
                        hook: str = "auto"):
    """FoF across shard boundaries via slab decomposition (SURVEY.md
    section 7 "hard parts": halo linking over slab edges; the reference
    has NO cross-rank FoF at all -- halo_finder.cpp is single-process
    and cluster_comm.cpp never links halos).

    The box is cut into `n_slabs` x-slabs. Each slab runs the standard
    single-device `fof_labels` on its OWNED particles plus a ghost
    layer of width `linking_length` from both periodic neighbors, so
    every FoF edge (pair within b) appears in at least one subset
    (an edge crossing a cut lies inside both adjacent subsets).
    Particle buffers per invocation are O(N/n_slabs + ghosts) -- slabs
    are pulled to the device one at a time, matching mesh-mode slab
    ownership, so states whose particle arrays exceed one chip's HBM
    stay analyzable. (The [ncell^3, capacity] cell lattice is still
    allocated at the caller's plan; pass a per-slab plan to shrink its
    capacity to the slab's occupancy.)

    Cross-slab components are stitched on the host: every subset row
    contributes a (particle, subset-root) star edge; vectorized
    min-label propagation with pointer jumping resolves the global
    components in O(log chain) numpy rounds. Labels match the global
    `fof_labels` semantics (label = component's minimum particle
    index; dead rows stay field singletons).

    Returns (labels [N] int32, overflow = summed per-slab merged-cell
    overflow counts; ghosts can be double-counted, so treat it as an
    upper bound -- it is exactly 0 when no slab overflowed).
    """
    import numpy as np

    n = positions.shape[0]
    if live is None:
        live = jnp.ones((n,), bool)
    x = np.asarray(positions[:, 0])
    live_np = np.asarray(live)
    width = box_size / n_slabs
    if width <= linking_length:
        raise ValueError(
            f"slab width {width:.3g} <= linking length {linking_length}"
            f" -- reduce n_slabs (ghost layers would overlap)")
    slab_of = np.minimum((x / width).astype(np.int64), n_slabs - 1)

    def in_ghost(s):
        lo, hi = s * width, (s + 1) * width
        dlo = (x - lo) % box_size            # distance "below" lo
        dhi = (hi - x) % box_size
        return ((dlo > box_size - linking_length)
                | (dhi > box_size - linking_length))

    sels = []
    for s in range(n_slabs):
        sel = ((slab_of == s) | in_ghost(s)) & live_np
        sels.append(np.nonzero(sel)[0])
    pad_n = max(int(i.size) for i in sels)
    # one compiled shape across slabs
    pad_n = max(pad_n, 1)

    g_arr, r_arr = [], []
    overflow_total = 0
    for s in range(n_slabs):
        gids = sels[s]
        k = gids.size
        sub_pos = np.zeros((pad_n, 3), np.asarray(positions).dtype)
        sub_pos[:k] = np.asarray(positions)[gids]
        sub_live = np.zeros((pad_n,), bool)
        sub_live[:k] = True
        lab_s, ovf = fof_labels(
            jnp.asarray(sub_pos), box_size, linking_length,
            ncell=ncell, capacity=capacity, live=jnp.asarray(sub_live),
            max_rounds=max_rounds, hook=hook)
        lab_s = np.asarray(lab_s)[:k]
        overflow_total += int(ovf)
        g_arr.append(gids)
        r_arr.append(gids[lab_s])            # subset root -> global id
    g_all = np.concatenate(g_arr) if g_arr else np.zeros(0, np.int64)
    r_all = np.concatenate(r_arr) if r_arr else np.zeros(0, np.int64)

    # host stitch: min-label propagation over star edges + pointer jumps
    lab = np.arange(n, dtype=np.int64)
    for _ in range(64):
        before = lab.copy()
        np.minimum.at(lab, g_all, lab[r_all])
        np.minimum.at(lab, r_all, lab[g_all])
        for _ in range(4):                   # pointer jumping
            lab = lab[lab]
        if np.array_equal(lab, before):
            break
    lab = np.where(live_np, lab, np.arange(n))
    return jnp.asarray(lab, jnp.int32), jnp.asarray(overflow_total,
                                                    jnp.int32)
