"""Rod-dense TreePM short-range kernel: packed z-sorted rods + windowed
pair tiles (the round-3 "move the floor" redesign).

The [C, K] cell-bucket kernel (ops/pallas_short_range, vpu3) is bound by
a N * 27 * 128 pair-slot floor: the j side is 27 stencil cells x a
128-lane capacity, so at the 1M bench geometry only ~56% of j lanes are
live and only ~70% of the +-1-cell z extent is within r_cut. This module
removes BOTH quantizations on the z axis:

  * particles are bucketed into nc^2 RODS (one per (cx, cy) cell column),
    packed DENSE and z-SORTED within each rod ([R, K_rod], live-first,
    dead tail) -- storage density ~84% vs ~56% for cell buckets;
  * the pair stencil is 9 rods x a CONTINUOUS z window [z_chunk_min -
    r_cut - delta, z_chunk_max + r_cut + delta], realized as dynamic
    128-aligned lane-tile windows into each neighbor rod (lane slices
    must be 128-aligned; the remaining slack is the +-64-lane average
    alignment loss, ~1 tile per window);
  * window bounds are precomputed OUTSIDE the kernel (vectorized int
    rank counts at rebucket time, valid while drift stays under delta --
    callers track a max-drift bound and rebucket early when it exceeds
    delta/2) and packed into per-(chunk, neighbor, segment) int32 table
    entries; each grid instance DMAs its table slice into SMEM and runs
    dynamic fori trip counts from it;
  * periodic z wrap = up to 3 window segments per (chunk, neighbor)
    (main / +box / -box), each a table entry with a z-shift selector;
    empty segments cost one scalar unpack (trip count 0).

Pair-slot accounting at the 1M bench geometry (ncell=24, occ 72,
delta=cell/16): vpu3 streams ceil(72/16)*16/72 * 27*128 = 3840 j-slots
per live particle; this kernel streams 9 * ~250 = ~2250, a ~1.7x floor
reduction at identical per-pair arithmetic (same even-polynomial split
as vpu3, ops/pallas_short_range._poly_even_coeffs).

MEASURED RESULT (v5e, 2026-08-19, benchmarks/bench_short_range_rd.py):
correct (1e-3 vs the erfc oracle) but 201 ms/call at the 1M geometry vs
vpu3's 66.3 — 3x SLOWER despite 1.7x fewer pair-slots. The 576 rods x
108 chunks x 27 table entries = 1.7M per-entry scalar decodes (SMEM
read + zsel unpack + fori setup + dynamic-lane-slice addressing,
~100 ns each on the v5e scalar core) dwarf the vector-work savings:
TPU's scalar unit is ~400x slower per op than one VPU lane row, so any
per-128-lane-tile scalar control costs more than streaming the dead
slots it avoids. Kept as the documented negative result for the
"move the floor via layout" approach (BASELINE.md roofline note); use
ops/pallas_short_range (vpu3) in production.

Replaces the role of the reference's shared-memory tree-walk force
kernels (barnes_hut_tree.cu:280-338); the rod-dense layout is the
TPU-native analogue of its Morton-ordered locality
(domain_decomposition.cpp:196-264).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_short_range import _poly_even_coeffs

# i-chunk sublane rows (8-aligned; same trade as vpu3's _CH)
_CH = 16
# table entries per (chunk, neighbor): main + top-wrap + bottom-wrap
_SEGS = 3
_ENT = 9 * _SEGS
# per-chunk entry stride padded to 32 so the per-rod table stride
# (nch * _ENT_PAD, with nch % 64 == 0) is a multiple of 1024 -- the
# 8x128 tile granule of Mosaic's internal 2-D view of 1-D arrays
_ENT_PAD = 32


def rd_geometry(num_particles: int, ncell: int, *,
                headroom: float = 1.25) -> int:
    """K_rod: rod slot capacity, a multiple of 1024 (the kernel's output
    block is [K_rod/128, 128] whose sublane dim K_rod/128 must divide by
    8). Mean rod occupancy is N/nc^2; a rod is ~nc Poisson cells so the
    relative occupancy spread is tiny (sigma/mean = 1/sqrt(N/nc^2)) and
    a modest headroom covers clustering far better than per-cell caps."""
    mean = num_particles / max(ncell * ncell, 1)
    k = int(math.ceil(headroom * mean))
    return max(1024, ((k + 1023) // 1024) * 1024)


def _zbits(ncell: int) -> int:
    """z quantization bits for the (rod, z) int32 sort key."""
    rbits = max(1, (ncell * ncell).bit_length())
    return min(21, 31 - rbits)


@functools.partial(jax.jit, static_argnames=("ncell", "k_rod"))
def rd_src_map(positions, masses, box_size, *, ncell: int, k_rod: int):
    """Rod-dense inverse slot map: src[dest_slot] -> source row (or n for
    dead slots), counts [R] live per rod, overflow count.

    Slots within a rod are z-SORTED (quantized key; window tables use the
    same quantized values so rank counts are positionally exact even
    across quantization ties) and live-first. One argsort + one int32
    scatter, like forces/treepm.bucket_src_map."""
    n = positions.shape[0]
    nrods = ncell * ncell
    cell = jnp.floor(positions / box_size * ncell).astype(jnp.int32)
    cell = jnp.clip(cell, 0, ncell - 1)
    rod = cell[:, 0] * ncell + cell[:, 1]
    live = masses > 0
    zb = _zbits(ncell)
    zq = jnp.clip((positions[:, 2] / box_size * (1 << zb)).astype(
        jnp.int32), 0, (1 << zb) - 1)
    key = jnp.where(live, (rod << zb) + zq, nrods << zb)

    order = jnp.argsort(key)
    key_s = key[order]
    rod_s = jnp.where(live[order], rod[order], nrods)

    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                rod_s[1:] != rod_s[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - run_start
    ok = (rank < k_rod) & live[order]
    nslots = nrods * k_rod
    slot = jnp.where(ok, rod_s * k_rod + rank, nslots)
    overflow = jnp.sum(~ok & live[order])

    src = jnp.full((nslots,), n, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    # live counts per rod from the sorted run structure (no scatter)
    bounds = jnp.searchsorted(rod_s, jnp.arange(nrods + 1,
                                                dtype=jnp.int32))
    counts = jnp.minimum(jnp.diff(bounds), k_rod).astype(jnp.int32)
    return src, counts, overflow


def rd_pack(positions, masses, box_size, *, ncell: int, k_rod: int):
    """One-call rod-dense packing: (rpos [R,K_rod,3], rmass [R,K_rod],
    counts [R], rzq [R,K_rod] quantized-z w/ dead sentinel, overflow,
    src). rzq feeds rd_window_tables with the exact values the sort
    keyed on."""
    nrods = ncell * ncell
    src, counts, overflow = rd_src_map(positions, masses, box_size,
                                       ncell=ncell, k_rod=k_rod)
    zb = _zbits(ncell)
    zq = jnp.clip((positions[:, 2] / box_size * (1 << zb)).astype(
        jnp.int32), 0, (1 << zb) - 1)
    rpos = rd_gather(positions, src).reshape(nrods, k_rod, 3)
    rmass = rd_gather(jnp.where(masses > 0, masses, 0.0),
                      src).reshape(nrods, k_rod)
    rzq = rd_gather(zq, src, fill=1 << zb).reshape(nrods, k_rod)
    return rpos, rmass, counts, rzq, overflow, src


def rd_gather(x, src, fill=0.0):
    """Gather a per-particle array into rod-dense slots (sentinel pad)."""
    pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)[src]


@functools.partial(jax.jit, static_argnames=("ncell", "k_rod",
                                             "box_size", "window"))
def rd_window_tables(rzq, counts, *, ncell: int, k_rod: int,
                     box_size: float, window: float):
    """Packed per-(rod, chunk, neighbor, segment) window table
    [R, NCH, 27] int32: entry = start_tile * 1024 + ntiles * 4 + zsel
    (zsel 0 = no shift, 1 = j + box [top wrap: i near the box top sees
    low-z j as images above], 2 = j - box [bottom wrap]).

    `rzq` [R, K_rod] int32: the QUANTIZED z of every slot (dead slots
    hold the max sentinel) -- rank counts on the same quantized values
    the sort used are positionally exact. `window` = r_cut + delta;
    bounds stay valid while any particle's drift since the rebucket is
    under delta/2 (callers track this; see fast stepper)."""
    nrods = ncell * ncell
    nch = k_rod // _CH
    zb = _zbits(ncell)
    scale = float(1 << zb) / box_size
    qmax = (1 << zb) - 1

    # per-chunk quantized z range over LIVE slots (dead = sentinel max)
    zc = rzq.reshape(nrods, nch, _CH)
    live = zc <= qmax
    zmin = jnp.min(jnp.where(live, zc, jnp.int32(2 ** 30)), axis=2)
    zmax = jnp.max(jnp.where(live, zc, jnp.int32(-1)), axis=2)
    has_live = jnp.any(live, axis=2)
    wq = jnp.int32(math.ceil(window * scale)) + 1
    z_lo = zmin - wq                       # [R, NCH] (may be < 0)
    z_hi = zmax + wq                       # (may be > qmax)

    rid = jnp.arange(nrods, dtype=jnp.int32)
    cx = rid // ncell
    cy = rid % ncell

    def rank_lt(nbr_zq, nbr_n, bound):
        """#slots with zq < bound (live only), [R, NCH]."""
        c = jnp.sum(nbr_zq[:, None, :] < bound[:, :, None], axis=2)
        return jnp.minimum(c.astype(jnp.int32), nbr_n[:, None])

    def seg_entry(start, end):
        """Pack a rank range into (start_tile, ntiles)."""
        st = start // 128
        nt = jnp.maximum((end + 127) // 128 - st, 0)
        nt = jnp.where(end > start, nt, 0)
        return st, nt

    entries = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            nbr = ((cx + dx) % ncell) * ncell + (cy + dy) % ncell
            nzq = rzq[nbr]                 # [R, K_rod]
            nn = counts[nbr]               # [R]
            # main segment: [clip(z_lo,0), clip(z_hi,qmax)]
            lo1 = jnp.maximum(z_lo, 0)
            hi1 = jnp.minimum(z_hi, qmax)
            s1 = rank_lt(nzq, nn, lo1)
            e1 = rank_lt(nzq, nn, hi1 + 1)
            st1, nt1 = seg_entry(s1, e1)
            ent1 = st1 * 1024 + nt1 * 4
            # top wrap (z_hi beyond box): j in [0, z_hi - qmax), j + box
            s2 = jnp.zeros_like(s1)
            e2 = rank_lt(nzq, nn, z_hi - qmax)
            e2 = jnp.where(z_hi > qmax, e2, 0)
            st2, nt2 = seg_entry(s2, e2)
            ent2 = st2 * 1024 + nt2 * 4 + 1
            # bottom wrap (z_lo below 0): j in [z_lo + qmax+1, n), j - box
            s3 = rank_lt(nzq, nn, z_lo + qmax + 1)
            e3 = jnp.where(z_lo < 0, nn[:, None]
                           + jnp.zeros_like(s1), 0)
            st3, nt3 = seg_entry(s3, e3)
            ent3 = st3 * 1024 + nt3 * 4 + 2
            zero = has_live
            entries.extend([jnp.where(zero, ent1, 0),
                            jnp.where(zero, ent2, 1),
                            jnp.where(zero, ent3, 2)])
    return jnp.stack(entries, axis=-1).astype(jnp.int32)  # [R, NCH, 27]


def _rd_kernel(counts_ref, tbl_hbm, pts_hbm, out_ref, *, nc, k_rod,
               box_size, rs, softening2):
    """One grid instance per rod: DMA 9 neighbor rods + this rod's window
    table, then sweep live i in _CH-row chunks against table-driven
    128-lane j tiles.

    DMA-layout constraints (Mosaic): per-rod slices must be on a LEADING
    untiled dim -- pts is [R, 4, K_rod] (at[r] keeps the tiled (4, K_rod)
    dims full) and the table is 1-D with a per-rod stride that is a
    multiple of 1024 (= 8 sublanes x 128 lanes of the internal 2-D view),
    hence the _ENT -> _ENT_PAD=32 entry padding."""
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    nch = k_rod // _CH
    kt = k_rod // 128
    stride = nch * _ENT_PAD
    chq, v_scale, _c1 = _poly_even_coeffs(rs)
    box = box_size

    def body(rods, tbl, icolg, accc, stage, sem, tsem):
        # rod DMAs: [4, K_rod] each, plus this rod's table slice -> SMEM
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    pts_hbm.at[r_id], rods.at[idx], sem.at[idx]))
                idx += 1
        tdma = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(i * stride, stride)], tbl, tsem)
        tdma.start()
        for dma in dmas:
            dma.start()
        tdma.wait()
        for dma in dmas:
            dma.wait()

        # periodic x/y unwrap once per rod (cell-index driven, as vpu3)
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                shift_x = jnp.where(cx + dx < 0, -box,
                                    jnp.where(cx + dx >= nc, box, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box,
                                    jnp.where(cy + dy >= nc, box, 0.0))
                rods[idx, 0:1, :] = rods[idx, 0:1, :] + shift_x
                rods[idx, 1:2, :] = rods[idx, 1:2, :] + shift_y
                idx += 1

        stage[...] = jnp.zeros_like(stage)

        cnt = counts_ref[i]
        ntrips = (cnt + _CH - 1) // _CH

        def chunk(t, _):
            # i coordinates: transpose the chunk's 128-lane group of the
            # center rod (dynamic 128-aligned lane slice), then slice 16
            # sublanes (dynamic 16-aligned sublane offset)
            g = (t * _CH) // 128
            soff = (t * _CH) % 128
            for comp in range(3):
                icolg[comp, :, :] = jnp.transpose(
                    rods[4, comp:comp + 1, pl.ds(g * 128, 128)])
            icx = icolg[0, pl.ds(soff, _CH), :]      # [_CH, 1]
            icy = icolg[1, pl.ds(soff, _CH), :]
            icz = icolg[2, pl.ds(soff, _CH), :]
            accc[...] = jnp.zeros_like(accc)

            for e in range(_ENT):
                nbr = e // _SEGS
                ent = tbl[t * _ENT_PAD + e]
                zsel = ent % 4
                nt = (ent // 4) % 256
                st = ent // 1024
                zshift = jnp.where(
                    zsel == 1, -box, jnp.where(zsel == 2, box, 0.0))
                izs = icz + zshift       # fold j z-shift into i side

                def tile(ti, _, nbr=nbr, izs=izs, st=st):
                    off = (st + ti) * 128
                    jx = rods[nbr, 0:1, pl.ds(off, 128)]   # [1, 128]
                    jy = rods[nbr, 1:2, pl.ds(off, 128)]
                    jz = rods[nbr, 2:3, pl.ds(off, 128)]
                    jm = rods[nbr, 3:4, pl.ds(off, 128)]
                    dxt = jx - icx                         # [_CH, 128]
                    dyt = jy - icy
                    dzt = jz - izs
                    r2 = dxt * dxt + (dyt * dyt + (dzt * dzt
                                                   + softening2))
                    inv_r = jax.lax.rsqrt(r2)
                    v = jnp.minimum(r2 * v_scale - 1.0, 1.0)
                    q = jnp.full_like(v, chq[0])
                    for c in chq[1:]:
                        q = q * v + c
                    f = jnp.maximum((inv_r * inv_r) * inv_r + q, 0.0)
                    w = jm * f
                    accc[0] += w * dxt
                    accc[1] += w * dyt
                    accc[2] += w * dzt
                    return ()

                jax.lax.fori_loop(0, nt, tile, ())

            # lane-reduce the chunk accumulator, stage on sublanes
            # (dynamic sublane offset t*_CH is 8-aligned)
            stage[0, pl.ds(t * _CH, _CH), :] = \
                jnp.sum(accc[0], axis=1, keepdims=True)
            stage[1, pl.ds(t * _CH, _CH), :] = \
                jnp.sum(accc[1], axis=1, keepdims=True)
            stage[2, pl.ds(t * _CH, _CH), :] = \
                jnp.sum(accc[2], axis=1, keepdims=True)
            return ()

        jax.lax.fori_loop(0, ntrips, chunk, ())

        # stage [3, K_rod, 1] -> out tiles [4, kt, 128]
        for comp in range(3):
            for tt in range(kt):
                out_ref[comp, tt:tt + 1, :] = jnp.transpose(
                    stage[comp, tt * 128:(tt + 1) * 128, :])
        out_ref[3, :, :] = jnp.zeros((kt, 128), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, k_rod), jnp.float32),
        tbl=pltpu.SMEM((nch * _ENT_PAD,), jnp.int32),
        icolg=pltpu.VMEM((3, 128, 1), jnp.float32),
        accc=pltpu.VMEM((3, _CH, 128), jnp.float32),
        stage=pltpu.VMEM((3, k_rod, 1), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9,)),
        tsem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnames=(
    "ncell", "k_rod", "box_size", "rs", "softening", "interpret"))
def pallas_short_range_rd(rpos, rmass, counts, tables, *, ncell: int,
                          k_rod: int, box_size: float, rs: float,
                          softening: float, interpret: bool = False):
    """Short-range accelerations for every rod slot -> [R, K_rod, 3].

    rpos [R, K_rod, 3] / rmass [R, K_rod] in the rod-dense z-sorted
    layout of rd_src_map; counts [R] live slots per rod; tables
    [R, K_rod//16, 27] from rd_window_tables. Requires ncell >= 3 and
    k_rod % 1024 == 0. Dead slots get garbage-but-finite output
    (mass 0 downstream); live slots past a window's drift margin are
    the caller's contract (track drift <= delta/2)."""
    if ncell < 3:
        raise ValueError("pallas_short_range_rd needs ncell >= 3")
    if k_rod % 1024:
        raise ValueError("k_rod must be a multiple of 1024")
    if softening <= 0:
        raise ValueError("softening must be > 0")
    nrods = ncell * ncell
    _, _, c1 = _poly_even_coeffs(float(rs))
    # layout [R, 4, K_rod]: at[r] DMAs one rod's 4 components as a
    # full-extent slice of the tiled (4, K_rod) trailing dims
    pts = jnp.concatenate(
        [rpos.transpose(0, 2, 1).astype(jnp.float32),
         (rmass.astype(jnp.float32) * c1)[:, None, :]], axis=1)

    kernel = functools.partial(
        _rd_kernel, nc=ncell, k_rod=k_rod, box_size=float(box_size),
        rs=float(rs), softening2=float(softening) ** 2)

    kt = k_rod // 128
    out = pl.pallas_call(
        kernel,
        grid=(nrods,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, kt, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, nrods * kt, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nrods * k_rod * 2500 * 40,
            bytes_accessed=nrods * k_rod * 16 * 10,
            transcendentals=nrods * k_rod * 2500,
        ),
        interpret=interpret,
    )(counts.astype(jnp.int32),
      jnp.pad(tables.reshape(nrods, -1, _ENT),
              ((0, 0), (0, 0), (0, _ENT_PAD - _ENT))).reshape(-1),
      pts)
    return (out.reshape(4, nrods, k_rod)[0:3]
            .transpose(1, 2, 0))
