"""Occupancy-aware Pallas kernel for the FoF hook sweep.

One friends-of-friends label-propagation round = for every occupied
bucket slot, the minimum label over all slots within the linking length
in the 27-cell neighborhood (analysis/halo_finder.fof_labels).  The jnp
lattice hook grinds the full padded [C, 27K, K] pair volume -- 97%
padding at production plans (1M clustered: 32^3 cells x 1024 capacity at
~3% occupancy = 4.9 s/sweep on a v5e).  This kernel mirrors the
production short-range force kernel (ops/pallas_short_range vpu3):

  * grid over (cx, cy) rods; 9 neighbor rods DMA'd HBM->VMEM whole
    (sublane offset 0 -- unaligned slice starts fail Mosaic's
    divisible-by-8 proof past one lane tile), periodic z halo planes
    register-copied from the wrap planes already in VMEM;
  * per center cell, the i side runs chunks of 16 sublane rows with a
    DYNAMIC trip count ceil(live/16) read from flat SMEM counts --
    buckets are live-first (forces/treepm.bucket_src_map), so dead
    rows are never touched;
  * labels ride in their own int32 [C, K] plane (DMA'd per rod next to
    the coordinate planes), so any particle count a device can hold is
    representable -- no f32-exactness cap.

Empty slots carry label `nbig` (= n) and are excluded on the j side by
`cand = linked ? j_label : nbig` -- their zeroed positions can
fake-link, but their nbig label is the identity of min.  Center-side
dead rows are skipped by the live trip count; rows past the live count
keep their incoming label (nbig), and hooked labels are only ever
gathered back for real particles.

Reference parity: src/analysis/halo_finder.cpp:15-120 (grid + union
find); re-derived as data-parallel min-label propagation for TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CH = 16   # i-chunk sublane rows (matches the short-range kernel)


def _fof_hook_kernel(counts_ref, rodact_ref, act_ref, pts_hbm, labs_hbm,
                     out_ref, *, nc, cap, box_size, b2, nbig, reverse,
                     bidi):
    # Gauss-Seidel sweep order: ascending rod-major (cx, cy) with z
    # innermost, or fully reversed when `reverse`.  Updated labels are
    # written back (a) into the center rod's VMEM label plane after each
    # z plane, and (b) into the aliased HBM labs buffer after each rod --
    # later planes/rods read fresher labels, so a label can travel the
    # whole lattice along the sweep direction in ONE round.  Min-label
    # propagation is monotone: any stale/fresh mix stays a valid label
    # of the same FoF component, so ordering hazards only cost rounds,
    # never correctness (worst case degrades to the Jacobi sweep).
    i = pl.program_id(0)
    if reverse:
        i = nc * nc - 1 - i
    cx = i // nc
    cy = i % nc

    def body(rods, rlab, jrow, jlab, icol, labc, sem, lsem):
        # wavefront skipping: a CELL whose 27-neighborhood saw no label
        # changes last round would re-derive the same mins -- its
        # z-plane is skipped inside the rod body; a rod with no active
        # cell at all skips everything (DMAs, assembly, write-back).
        # The aliased HBM labels buffer keeps skipped labels in place,
        # so neighbors still read them. By the late rounds only
        # critical percolation chains remain active (a few % of cells).
        @pl.when(rodact_ref[i] != 0)
        def _active_body():
            _fof_rod_body(counts_ref, act_ref, pts_hbm, labs_hbm,
                          out_ref, rods, rlab, jrow, jlab, icol, labc,
                          sem, lsem, i=i, cx=cx, cy=cy, nc=nc, cap=cap,
                          box_size=box_size, b2=b2, nbig=nbig,
                          reverse=reverse, bidi=bidi)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 3, nc + 2, cap), jnp.float32),
        rlab=pltpu.VMEM((9, nc + 2, cap), jnp.int32),
        jrow=pltpu.VMEM((3, 27 * cap), jnp.float32),
        jlab=pltpu.VMEM((1, 27 * cap), jnp.int32),
        icol=pltpu.VMEM((3, cap, 1), jnp.float32),
        labc=pltpu.VMEM((cap, 1), jnp.int32),
        sem=pltpu.SemaphoreType.DMA((9,)),
        lsem=pltpu.SemaphoreType.DMA((9,)),
    )


def _fof_rod_body(counts_ref, act_ref, pts_hbm, labs_hbm, out_ref, rods,
                  rlab, jrow, jlab, icol, labc, sem, lsem, *, i, cx, cy,
                  nc, cap, box_size, b2, nbig, reverse, bidi):
    dmas = []
    idx = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
            dmas.append(pltpu.make_async_copy(
                pts_hbm.at[:, r_id], rods.at[idx, :, pl.ds(0, nc)],
                sem.at[idx]))
            dmas.append(pltpu.make_async_copy(
                labs_hbm.at[r_id], rlab.at[idx, pl.ds(0, nc)],
                lsem.at[idx]))
            idx += 1
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()

    # periodic halo planes (z = -1 at index nc, z = nc at nc+1) are
    # wraps within the same rod: register copies, no extra DMAs
    idx = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            rods[idx, :, nc:nc + 1, :] = rods[idx, :, nc - 1:nc, :]
            rods[idx, :, nc + 1:nc + 2, :] = rods[idx, :, 0:1, :]
            rlab[idx, nc:nc + 1, :] = rlab[idx, nc - 1:nc, :]
            rlab[idx, nc + 1:nc + 2, :] = rlab[idx, 0:1, :]
            shift_x = jnp.where(cx + dx < 0, -box_size,
                                jnp.where(cx + dx >= nc, box_size, 0.0))
            shift_y = jnp.where(cy + dy < 0, -box_size,
                                jnp.where(cy + dy >= nc, box_size, 0.0))
            rods[idx, 0] = rods[idx, 0] + shift_x
            rods[idx, 1] = rods[idx, 1] + shift_y
            rods[idx, 2, nc:nc + 1, :] = \
                rods[idx, 2, nc:nc + 1, :] - box_size
            rods[idx, 2, nc + 1:nc + 2, :] = \
                rods[idx, 2, nc + 1:nc + 2, :] + box_size
            idx += 1

    def zplane(z):
        return nc if z == -1 else (nc + 1 if z == nc else z)

    zorder = list(range(nc - 1, -1, -1) if reverse else range(nc))
    if bidi:
        # in-rod bidirectional z: sweep back down the rod while its
        # label planes are still in VMEM -- the return sweep costs pair
        # work but ZERO extra DMA, and one rod visit then propagates
        # labels along BOTH z directions (the forward-only sweep needed
        # a whole extra round, with its full 9-rod DMA bill, for the
        # backward reach). The turnaround plane is not repeated.
        zorder = zorder + zorder[-2::-1]
    for zc in zorder:
        # cell-level wavefront skip: late-round activity is sparse but
        # spatially UNIFORM (background percolation chains), so rod
        # granularity saves little -- plane granularity is where the
        # assembly + pair work actually drops
        @pl.when(act_ref[i * nc + zc] != 0)
        def _plane(zc=zc):
            for r in range(9):
                for sc in range(3):
                    zi = zplane(zc + sc - 1)
                    off = (r * 3 + sc) * cap
                    for comp in range(3):      # x, y, z
                        jrow[comp:comp + 1, off:off + cap] = \
                            rods[r, comp, zi:zi + 1, :]
                    jlab[0:1, off:off + cap] = rlab[r, zi:zi + 1, :]
            icol[0, :, :] = jnp.transpose(rods[4, 0, zc:1 + zc, :])
            icol[1, :, :] = jnp.transpose(rods[4, 1, zc:1 + zc, :])
            icol[2, :, :] = jnp.transpose(rods[4, 2, zc:1 + zc, :])
            # init with incoming labels: rows past the live count (and
            # fully dead cells) pass through unchanged
            labc[...] = jnp.transpose(rlab[4, zc:1 + zc, :])

            ch = min(_CH, cap)
            cnt = counts_ref[i * nc + zc]
            kiq = (cnt + ch - 1) // ch

            def chunk(ci, _):
                s8 = pl.ds(ci * ch, ch)
                dxt = jrow[0:1, :] - icol[0, s8, :]    # [ch, 27*cap]
                dyt = jrow[1:2, :] - icol[1, s8, :]
                dzt = jrow[2:3, :] - icol[2, s8, :]
                r2 = dxt * dxt + (dyt * dyt + dzt * dzt)
                cand = jnp.where(r2 < b2, jlab[0:1, :], nbig)
                labc[s8, :] = jnp.minimum(
                    labc[s8, :],
                    jnp.min(cand, axis=1, keepdims=True))
                return ()

            jax.lax.fori_loop(0, kiq, chunk, ())
            # within-rod Gauss-Seidel: the next z plane's jlab assembly
            # re-reads this plane from rlab, so it sees the fresh labels
            rlab[4, zc:zc + 1, :] = jnp.transpose(labc[:, :])

    # cross-rod Gauss-Seidel: flush the rod's updated label planes
    # back to the aliased HBM buffer and WAIT -- the next grid step
    # (sequential on TPU) DMAs its 9 neighbor rods from there
    wb = pltpu.make_async_copy(
        rlab.at[4, pl.ds(0, nc)], out_ref.at[i], lsem.at[0])
    wb.start()
    wb.wait()


@functools.partial(jax.jit, static_argnames=("ncell", "capacity",
                                             "n_sentinel", "box_size",
                                             "linking_length",
                                             "interpret", "reverse",
                                             "bidirectional"))
def pallas_fof_hook(bx, by, bz, slot_lab, counts, *, ncell: int,
                    capacity: int, n_sentinel: int, box_size,
                    linking_length, interpret: bool = False,
                    reverse: bool = False, bidirectional: bool = False,
                    active=None):
    """One FoF min-label GAUSS-SEIDEL sweep -> new slot labels [C, K] i32.

    bx/by/bz [C, K] bucketed coordinates, slot_lab [C, K] int32 labels
    (empty slots = n_sentinel), counts [C] int32 live counts per cell.
    Requires ncell >= 3 and capacity a multiple of 128 (jrow/jlab lane
    slices sit at multiples of capacity and Mosaic needs them
    128-aligned).

    The sweep reads partially-updated labels (within-rod z write-back +
    cross-rod write-back through an input/output-aliased HBM buffer), so
    one call propagates labels arbitrarily far along the sweep order;
    callers alternate `reverse` per round for bidirectional coverage.
    Output labels are elementwise <= the Jacobi sweep's, and every label
    stays inside its FoF component, so the caller's fixpoint (and the
    final components) are unchanged -- only the round count drops.

    `active` (int32 [C] per-CELL mask, default all-ones) marks which
    cells to re-hook this round: inactive cells' z-planes are skipped
    (and rods with no active cell skip their DMAs entirely), keeping
    their incoming labels (wavefront convergence -- pass the
    27-dilation of last round's changed cells).

    `bidirectional` adds an in-rod RETURN z sweep per rod visit (the
    label planes are already in VMEM, so the second sweep pays pair
    work but no DMA): one round then propagates along both z
    directions, ~halving the global round count on percolation-limited
    clustered boxes. Same fixpoint, same monotonicity argument.
    """
    if capacity % 128:
        raise ValueError("pallas_fof_hook needs capacity % 128 == 0 "
                         "(use the jnp hook for smaller capacities)")
    if ncell < 3:
        raise ValueError("pallas_fof_hook needs ncell >= 3")
    cc = ncell ** 3
    cap = capacity
    if active is None:
        active = jnp.ones((cc,), jnp.int32)
    active = active.astype(jnp.int32)
    rod_active = active.reshape(ncell * ncell, ncell).max(axis=1)
    pts = jnp.stack([bx, by, bz], axis=0) \
        .reshape(3, ncell * ncell, ncell, cap)
    labs = slot_lab.astype(jnp.int32).reshape(ncell * ncell, ncell, cap)
    kernel = functools.partial(
        _fof_hook_kernel, nc=ncell, cap=cap, box_size=float(box_size),
        b2=float(linking_length) ** 2, nbig=int(n_sentinel),
        reverse=reverse, bidi=bidirectional)
    out = pl.pallas_call(
        kernel,
        grid=(ncell * ncell,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        # the output IS the labs buffer (rewritten rod by rod);
        # aliasing is what lets later rods read earlier rods' fresh
        # labels straight from HBM
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ncell * ncell, ncell, cap),
                                       jnp.int32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=cc * cap * 27 * cap * 8,
            bytes_accessed=cc * cap * 16 * 10,
            transcendentals=0,
        ),
        interpret=interpret,
    )(counts.reshape(cc), rod_active, active, pts, labs)
    return out.reshape(cc, cap)
