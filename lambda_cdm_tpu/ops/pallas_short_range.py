"""Pallas TPU kernel: TreePM short-range pairwise forces on cell buckets.

The jnp roll-based short-range pass (forces/treepm.short_range_bucketed)
is HBM-bound: XLA materializes the [K, K, 3] pair tensors per cell slab,
costing ~350 ms at 1M particles on v5e. This kernel keeps every pair tile
in VMEM (the componentwise rank-broadcast trick of ops/pallas_direct) and
streams neighbor data as contiguous z-rods:

  * buckets stored as [4, C*K] SoA (x, y, z, m), cells z-major;
  * one grid instance per (cx, cy) rod: DMA the 9 neighbor (dx, dy) rods
    once into per-component VMEM buffers [9, nc+2, K] (z halo included for
    periodic wrap), then sweep the rod's nc cells -- Mosaic lane slicing
    stays aligned because cells index the *leading* buffer dimensions;
  * the production variant (vpu3) runs i in 16-row sublane chunks with a
    DYNAMIC trip count from the per-cell live counts, skipping the
    dead-padding rows that the 128-lane capacity quantization forces
    (~44% of slots at the 1M bench geometry), against one assembled
    [1, 27*K] j row per cell;
  * the erfc force split is an unrolled polynomial in a normalized
    variable (compile-time coefficients; rsqrt is the only
    transcendental) -- vpu3 evaluates it directly in r^2;
  * zero-mass padding slots contribute exactly zero.

Replaces the role of the reference's shared-memory tree-walk force kernels
(barnes_hut_tree.cu:280-338) at TPU-native efficiency.

NOTE (round-2 close-out): vpu3 sits at this data structure's hardware
floor on v5e; analyzed alternatives that do NOT pay off:
  * Packed-j layouts (z-sorted per-rod arrays, per-cell offsets): any
    per-cell j access quantizes to 128 lanes (lane slices must be
    128-aligned, dynamic or static), so a static window capacity must
    cover the worst (rod, z) window + 128 alignment slack — measured
    against the numbers, slots/live-i lands within ~5% of the current
    27*cap scheme at every occupancy tried (72/128 bench, 24/128 at
    100k, 57/128 at 10M). The pair-slot floor is N * 27 * 128 for any
    geometry with cap=128; vpu3 runs ~11% above it (i-chunk padding).
  * MXU Gram-matrix r^2: cancellation error eps*|x|^2/r^2 with
    cell-magnitude coordinates reaches ~4e-3 on sub-softening pairs —
    above the 1e-3 force-accuracy bar (same conclusion as the direct
    kernel's NOTE, which has box-magnitude coordinates and is far
    worse).
  * Newton's-3rd-law cell-pair halving: only the 3/27 center-rod share
    is exploitable inside one sequential grid instance (cross-instance
    accumulation would race); <4% upside.
  * Newton-3 ACROSS instances via per-offset output buffers (round-3
    re-analysis of the remaining cross-instance idea, in vreg-row
    issues per [16,128] pair tile on vpu4b): the mirror tile this
    saves costs 36 (shared pair math) + 8 (i-accumulate) = 44 issues;
    the j-side accumulation it adds costs 2 (wj = m_i*f) + 6 (wj*d) +
    ~18 (three cross-sublane reductions [16,128]->[1,128]) + 6 (VMEM
    read-modify-write of the j accumulator) = ~32 issues, i.e. a
    ~14% net cut of the pair loop BEFORE the new fixed costs: 13
    per-offset HBM force buffers (one [4, nc^3, cap] f32 write + read
    each, ~1 ms at the 1M geometry) and an XLA reduction pass. Every
    scheme in this family has measured at or above its issue-count
    estimate (rod-dense: 4x over; vpu4: 2x over), so the realistic
    upside is <=10% with high Mosaic-lowering risk -- rejected. The
    j-reduction is irreducible: holding [16,128] j accumulators per
    (rod, zr) tile to amortize it needs 9*(nc/2+2)*3 vregs (~4 MB
    VMEM at nc=32) and still pays the same RMW issues per tile.
  * Lower-degree split polynomial: degree 8 costs 2 of ~31 VPU
    ops/pair but raises the S-error 25x (1.4e-3); not worth it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..forces.treepm import _fit_short_poly

# polynomial coefficients as plain python floats -> unrolled FMA chain
_COEFFS, _X_MAX = _fit_short_poly()
_COEFFS_F = [float(c) for c in _COEFFS]


def _poly_s(x):
    s = jnp.full_like(x, _COEFFS_F[0])
    for c in _COEFFS_F[1:]:
        s = s * x + c
    return jnp.where(x < _X_MAX, jnp.maximum(s, 0.0), 0.0)


def _poly_r_coeffs(rs: float, degree: int = 11):
    """Endpoint-factored fit of the split function in a normalized
    variable: S(r) - S(r_max) = (1 - t) * h(t) with t = 2 r / r_max - 1
    on [-1, 1] and h a degree-`degree` polynomial.

    Three wins over Horner-in-x on the raw polyfit coefficients:
      * [-1, 1] monomials are well-conditioned in f32 (raw x^10 Horner
        loses ~1.5 digits: 2.7e-4 vs 1.8e-5 max error here);
      * the (1 - t) factor pins S(clamp(r)) to EXACTLY zero at and beyond
        the cutoff, so the per-pair `where(x < x_max)` + `max(s, 0)`
        trimming collapses into the existing min() clamp;
      * evaluating in (a scaled) r saves the x = r/(2 rs) rescale.

    Returns (h coefficients highest-first, t_scale, r_max): per pair,
    t = r * t_scale - 1, s = (1 - t) * h(t)."""
    import math

    import numpy as np
    r_max = 2.0 * rs * _X_MAX
    r = np.linspace(0.0, r_max, 4001)[:-1]
    x = r / (2.0 * rs)
    s = np.array([math.erfc(v) + (2.0 * v / math.sqrt(math.pi))
                  * math.exp(-v * v) for v in x])
    s_end = (math.erfc(_X_MAX) + (2.0 * _X_MAX / math.sqrt(math.pi))
             * math.exp(-_X_MAX * _X_MAX))
    t = 2.0 * r / r_max - 1.0
    ch = np.polyfit(t, (s - s_end) / (1.0 - t), degree)
    got = (1.0 - t) * np.polyval(ch.astype(np.float32),
                                 t.astype(np.float32))
    err = float(np.max(np.abs(got - (s - s_end))))
    assert err < 1e-4, f"factored short poly fit error {err}"
    return [float(c) for c in ch], float(2.0 / r_max), float(r_max)


def _poly_even_coeffs(rs: float, degree: int = 10):
    """Even-polynomial split: express the pair weight directly in r^2,
    skipping the r = r^2 * rsqrt(r^2) evaluation entirely.

    S(x) - 1 is an odd series starting at x^3, so (S(x) - 1)/x^3 is a
    smooth EVEN function -> fit Q(v) in the normalized variable
    v = 2 (x/x_max)^2 - 1 = r^2 * v_scale - 1 (one FMA from r^2).
    The truncated split uses S_eff = S - S(x_max) (continuous zero at the
    cutoff, same convention as _poly_r_coeffs), giving the pair weight

        f(r^2) = max(c1 * inv_r^3 + c8 * Q(min(v, 1)), 0)

    with c1 = 1 - S(x_max), c8 = 1/(8 rs^3): beyond the cutoff the max()
    clamps f to exactly 0 (c8*Q(1) = -c1/r_max^3 dominates inv_r^3).
    c8 and 1/c1 are folded into the returned coefficients so the kernel
    computes w = (m*c1) * max(inv_r^3 + Q'(v), 0).

    Validated: 2.15e-5 max force-weight error vs a float64 oracle in f32
    (degree 10), on par with the factored-r fit at ~2 fewer VPU ops/pair.
    """
    import math

    import numpy as np
    x_max = _X_MAX
    u_max = x_max * x_max
    u = np.linspace(1e-8, u_max, 8001)
    x = np.sqrt(u)
    s = np.array([math.erfc(t) + (2.0 * t / math.sqrt(math.pi))
                  * math.exp(-t * t) for t in x])
    qt = (s - 1.0) / x ** 3
    v = 2.0 * u / u_max - 1.0
    c = np.polyfit(v, qt, degree)
    got = np.polyval(c.astype(np.float32), v.astype(np.float32))
    err = float(np.max(np.abs((got - qt) * x ** 3)))
    assert err < 2e-4, f"even split poly fit error {err}"
    s_end = (math.erfc(x_max) + (2.0 * x_max / math.sqrt(math.pi))
             * math.exp(-x_max * x_max))
    c1 = 1.0 - s_end
    c8 = 1.0 / (8.0 * rs ** 3)
    v_scale = 2.0 / (u_max * 4.0 * rs * rs)   # v = r^2 * v_scale - 1
    return ([float(cc * c8 / c1) for cc in c], float(v_scale), float(c1))


_CH = 16   # i-chunk sublane rows (8-aligned; 16 halves loop+reduce
           # overhead for ~4% extra tail-padding work at occ ~72)


def _short_kernel_v3(counts_ref, pts_hbm, out_ref, *, nc, cap, box_size,
                     rs, softening2):
    """Occupancy-aware variant: per center cell, i runs in chunks of _CH
    sublane rows with a DYNAMIC trip count ceil(live/_CH) (buckets are
    live-first, forces/treepm.bucket_particles), against ONE assembled
    [1, 27*cap] j row.  Skips the ~44% dead i-rows the fixed-shape
    kernels grind through (the round-2 "occupancy" gap in PARITY.md):
    work drops from C*cap*27*cap to C*ceil(occ/_CH)*_CH*27*cap pairs.

    Also uses the even-polynomial split (_poly_even_coeffs): the pair
    weight is evaluated straight from r^2 (no r, no endpoint factor).

    MAINTENANCE: ops/pallas_fof._fof_hook_kernel mirrors this kernel's
    rod-DMA / halo-register-copy / jrow-assembly scaffolding (payload:
    min-label instead of force). Fixes to the Mosaic-constrained
    scaffolding here almost certainly apply there too.
    """
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    chq, v_scale, c1 = _poly_even_coeffs(rs)

    def body(rods, jrow, icol, accc, sem):
        # rods plane layout: [0, nc) = z 0..nc-1 (the DMA target starts
        # at sublane offset 0 -- a DMA whose slice starts at an
        # unaligned sublane offset fails Mosaic's divisible-by-8 proof
        # once cap > 128, i.e. more than one lane tile); plane nc = the
        # z=-1 halo, plane nc+1 = the z=nc halo. The halo planes are
        # periodic wraps WITHIN the same rod, so they are already in
        # VMEM after the rod copy: register-copy them into place
        # (register reads/writes take any static sublane offset; the
        # old per-plane halo DMAs sliced HBM at offset nc-1, which
        # Mosaic rejects for multi-lane-tile cap).
        src = pts_hbm
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id], rods.at[idx, :, pl.ds(0, nc)],
                    sem.at[idx]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                rods[idx, :, nc:nc + 1, :] = rods[idx, :, nc - 1:nc, :]
                rods[idx, :, nc + 1:nc + 2, :] = rods[idx, :, 0:1, :]
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
            """rods plane index for true z (halos live at nc, nc+1)."""
            return nc if z == -1 else (nc + 1 if z == nc else z)

        for zc in range(nc):
            # assemble the 27-neighborhood as one [4, 27*cap] row set
            for r in range(9):
                for sc in range(3):
                    zi = zplane(zc + sc - 1)
                    off = (r * 3 + sc) * cap
                    for comp in range(3):
                        jrow[comp:comp + 1, off:off + cap] = \
                            rods[r, comp, zi:zi + 1, :]
                    # fold c1 into the j masses (w = m*c1 * max(...))
                    jrow[3:4, off:off + cap] = \
                        rods[r, 3, zi:zi + 1, :] * c1
            # i coordinates as columns (lane -> sublane relayout, once)
            icol[0, :, :] = jnp.transpose(rods[4, 0, zc:1 + zc, :])
            icol[1, :, :] = jnp.transpose(rods[4, 1, zc:1 + zc, :])
            icol[2, :, :] = jnp.transpose(rods[4, 2, zc:1 + zc, :])
            accc[...] = jnp.zeros_like(accc)

            ch = min(_CH, cap)
            cnt = counts_ref[i * nc + zc]
            kiq = (cnt + ch - 1) // ch

            def chunk(ci, _):
                s8 = pl.ds(ci * ch, ch)
                jx = jrow[0:1, :]
                jy = jrow[1:2, :]
                jz = jrow[2:3, :]
                jm = jrow[3:4, :]
                dxt = jx - icol[0, s8, :]          # [8, 27*cap]
                dyt = jy - icol[1, s8, :]
                dzt = jz - icol[2, s8, :]
                r2 = dxt * dxt + (dyt * dyt + (dzt * dzt + softening2))
                inv_r = jax.lax.rsqrt(r2)
                v = jnp.minimum(r2 * v_scale - 1.0, 1.0)
                q = jnp.full_like(v, chq[0])
                for c in chq[1:]:
                    q = q * v + c
                f = jnp.maximum((inv_r * inv_r) * inv_r + q, 0.0)
                w = jm * f
                accc[0, s8, :] = jnp.sum(w * dxt, axis=1, keepdims=True)
                accc[1, s8, :] = jnp.sum(w * dyt, axis=1, keepdims=True)
                accc[2, s8, :] = jnp.sum(w * dzt, axis=1, keepdims=True)
                return ()

            jax.lax.fori_loop(0, kiq, chunk, ())

            out_ref[0, zc:zc + 1, :] = jnp.transpose(accc[0, :, :])
            out_ref[1, zc:zc + 1, :] = jnp.transpose(accc[1, :, :])
            out_ref[2, zc:zc + 1, :] = jnp.transpose(accc[2, :, :])
        out_ref[3, :, :] = jnp.zeros((nc, cap), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc + 2, cap), jnp.float32),
        jrow=pltpu.VMEM((4, 27 * cap), jnp.float32),
        icol=pltpu.VMEM((3, cap, 1), jnp.float32),
        accc=pltpu.VMEM((3, cap, 1), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9,)),
    )


def _short_kernel_v5(counts_ref, rodchunks_ref, pts_hbm, out_ref, *, nc,
                     cap, box_size, rs, softening2):
    """Occupancy-WINDOWED variant for grown capacities (cap > 128).

    vpu3's costs scale with the static capacity twice over: the 9-rod
    DMA moves [4, nc, cap] per rod, and the assembled j row spans
    27*cap lanes -- so a clustered box that grew cap 64 -> 1024 pays
    16x the DMA and j work for ~the same live pairs (the 1M science
    run measured 2.0 -> 5.0 s/step across two growth rungs). Here both
    costs track OCCUPANCY:

      * rod DMA runs in 128-lane chunks with a DYNAMIC trip count from
        the rod's max cell occupancy (rodchunks, SMEM) -- lane offsets
        are multiples of 128, which Mosaic accepts as aligned;
      * the j side loops the 27 neighbor cells individually, each with
        a DYNAMIC 128-lane-chunk trip count from that CELL's live
        count, accumulating [CH, 128] partial sums that reduce once
        per (i-chunk, neighbor);
      * lanes beyond a rod's DMA window hold stale VMEM garbage and
        are NEVER read: every j access is bounded by its cell count
        <= the rod window (buckets are live-first).

    Work model: DMA ~ 9 sum_rods nc*ceil(maxocc_rod/128)*128, pairs ~
    sum_cells ceil(occ_i/CH)*CH * sum_nbr ceil(occ_j/128)*128 -- both
    independent of the static cap, so the capacity ladder stops
    costing anything beyond memory. At uniform low occupancy vpu3's
    single wide j row has less loop overhead; the plan keeps vpu3/vpu4b
    for cap <= 128 and selects vpu5 above."""
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    chq, v_scale, c1 = _poly_even_coeffs(rs)

    def body(rods, jrow, icol, accc, sem):
        src = pts_hbm
        # windowed rod DMA: ceil(maxocc_rod/128) chunks of [4, nc, 128]
        for idx, (dx, dy) in enumerate(
                (a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)):
            r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)

            def dma_chunk(k, _, idx=idx, r_id=r_id):
                cp = pltpu.make_async_copy(
                    src.at[:, r_id, :, pl.ds(k * 128, 128)],
                    rods.at[idx, :, pl.ds(0, nc), pl.ds(k * 128, 128)],
                    sem.at[idx])
                cp.start()
                cp.wait()
                return ()

            jax.lax.fori_loop(0, rodchunks_ref[r_id], dma_chunk, ())

        # halo planes + periodic unwrap (same scheme as vpu3); the ops
        # touch full-cap rows, but lanes beyond each rod's window are
        # never read by the bounded j loops below. NOTE: windowing
        # these (and the staging below) behind dynamic 128-chunk
        # fori_loops HANGS the Mosaic compile (>12 min at cap 512 vs
        # 35 s for this form) -- the static full-cap ops cost O(cap)
        # VPU time but compile reliably; revisit only with a measured
        # profile and a compile-time budget.
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                rods[idx, :, nc:nc + 1, :] = rods[idx, :, nc - 1:nc, :]
                rods[idx, :, nc + 1:nc + 2, :] = rods[idx, :, 0:1, :]
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

        def zwrap(z):
            """flat cell id z for the counts lookup (true periodic z)."""
            return (z + nc) % nc

        for zc in range(nc):
            ch = min(_CH, cap)
            cnt = counts_ref[i * nc + zc]
            kiq = (cnt + ch - 1) // ch
            icol[0, :, :] = jnp.transpose(rods[4, 0, zc:1 + zc, :])
            icol[1, :, :] = jnp.transpose(rods[4, 1, zc:1 + zc, :])
            icol[2, :, :] = jnp.transpose(rods[4, 2, zc:1 + zc, :])
            accc[...] = jnp.zeros_like(accc)

            # neighbor chunk depth: how many 128-lane chunks the
            # DEEPEST of the 27 neighbor cells occupies (scalar SMEM
            # reads; 1 for ~all cells except halo cores)
            jmax = jnp.int32(0)
            nbr = []
            idx = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                    for sc in range(3):
                        jcnt = counts_ref[r_id * nc + zwrap(zc + sc - 1)]
                        nbr.append((idx, zplane(zc + sc - 1), jcnt))
                        jmax = jnp.maximum(jmax, jcnt)
                    idx += 1
            jkq = (jmax + 127) // 128

            def assemble(k):
                """jrow chunk k: lane segment [k*128, (k+1)*128) of all
                27 neighbors, zeroed where the neighbor has no live
                slots that deep (its rod window may not reach chunk k:
                those VMEM lanes are stale garbage, never DMA'd)."""
                base = k * 128
                for seg, (r, zi, jcnt) in enumerate(nbr):
                    off = seg * 128
                    sl = pl.ds(base, 128)

                    @pl.when(jcnt > base)
                    def _copy(r=r, zi=zi, off=off, sl=sl):
                        for comp in range(3):
                            jrow[comp:comp + 1, off:off + 128] = \
                                rods[r, comp, zi:zi + 1, sl]
                        jrow[3:4, off:off + 128] = \
                            rods[r, 3, zi:zi + 1, sl] * c1

                    @pl.when(jcnt <= base)
                    def _zero(off=off):
                        jrow[:, off:off + 128] = \
                            jnp.zeros((4, 128), jnp.float32)

            def pair_pass(acc_add):
                """one wide [ch, 27*128] pass of the assembled jrow
                against the cell's live i chunks, accumulated into
                accc (+= across overflow chunks via acc_add)."""
                def i_chunk(ci, _):
                    s8 = pl.ds(ci * ch, ch)
                    jx = jrow[0:1, :]
                    jy = jrow[1:2, :]
                    jz = jrow[2:3, :]
                    jm = jrow[3:4, :]
                    dxt = jx - icol[0, s8, :]       # [ch, 27*128]
                    dyt = jy - icol[1, s8, :]
                    dzt = jz - icol[2, s8, :]
                    r2 = dxt * dxt + (dyt * dyt + (dzt * dzt
                                                   + softening2))
                    inv_r = jax.lax.rsqrt(r2)
                    v = jnp.minimum(r2 * v_scale - 1.0, 1.0)
                    q = jnp.full_like(v, chq[0])
                    for c in chq[1:]:
                        q = q * v + c
                    f = jnp.maximum((inv_r * inv_r) * inv_r + q, 0.0)
                    w = jm * f
                    ax = jnp.sum(w * dxt, axis=1, keepdims=True)
                    ay = jnp.sum(w * dyt, axis=1, keepdims=True)
                    az = jnp.sum(w * dzt, axis=1, keepdims=True)
                    if acc_add:
                        accc[0, s8, :] = accc[0, s8, :] + ax
                        accc[1, s8, :] = accc[1, s8, :] + ay
                        accc[2, s8, :] = accc[2, s8, :] + az
                    else:
                        accc[0, s8, :] = ax
                        accc[1, s8, :] = ay
                        accc[2, s8, :] = az
                    return ()

                jax.lax.fori_loop(0, kiq, i_chunk, ())

            # prefix pass: chunk 0 of every neighbor -- identical cost
            # shape to vpu3 at cap 128, which is the point: ~all cells
            # end here (one wide row, no per-neighbor loops; the
            # per-(i-chunk, neighbor) fori structure this replaces
            # measured 5.5 s/step at 1M/cap-4096 from ~2M loop bodies)
            assemble(0)
            pair_pass(acc_add=False)

            # overflow sweep: deeper 128-chunks, only as deep as the
            # DEEPEST neighbor actually goes (dynamic trip count;
            # zero iterations everywhere but halo cores)
            def deep(k, _):
                assemble(k)
                pair_pass(acc_add=True)
                return ()

            jax.lax.fori_loop(1, jkq, deep, ())

            out_ref[0, zc:zc + 1, :] = jnp.transpose(accc[0, :, :])
            out_ref[1, zc:zc + 1, :] = jnp.transpose(accc[1, :, :])
            out_ref[2, zc:zc + 1, :] = jnp.transpose(accc[2, :, :])
        out_ref[3, :, :] = jnp.zeros((nc, cap), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc + 2, cap), jnp.float32),
        jrow=pltpu.VMEM((4, 27 * 128), jnp.float32),
        icol=pltpu.VMEM((3, cap, 1), jnp.float32),
        accc=pltpu.VMEM((3, cap, 1), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9,)),
    )


def _short_kernel_mxu(pts_hbm, out_ref, *, nc, cap, box_size, rs,
                      softening2):
    """MXU-accumulation variant: same rod DMA/unwrap as _short_kernel, but
    the pair reductions run as ONE batched GEMM per (rod, z-shift):
        W[nc, cap, cap] @ Pj1[nc, cap, 4] -> [Sw.xj, Sw.yj, Sw.zj, Sw]
    so acc_i = (W @ Pj1)[0:3] - (W @ Pj1)[3] * pi. Replaces three
    lane-axis reductions (VPU-expensive) with a K=cap=128 matmul
    (MXU-native)."""
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    inv_2rs = 1.0 / (2.0 * rs)

    def body(rods, sem):
        src = pts_hbm
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id], rods.at[idx, :, pl.ds(1, nc)],
                    sem.at[idx, 0]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(nc - 1, 1)],
                    rods.at[idx, :, pl.ds(0, 1)], sem.at[idx, 1]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(0, 1)],
                    rods.at[idx, :, pl.ds(nc + 1, 1)], sem.at[idx, 2]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                shift_x = jnp.where(cx + dx < 0, -box_size,
                                    jnp.where(cx + dx >= nc, box_size, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box_size,
                                    jnp.where(cy + dy >= nc, box_size, 0.0))
                rods[idx, 0] = rods[idx, 0] + shift_x
                rods[idx, 1] = rods[idx, 1] + shift_y
                rods[idx, 2, 0:1, :] = rods[idx, 2, 0:1, :] - box_size
                rods[idx, 2, nc + 1:nc + 2, :] = \
                    rods[idx, 2, nc + 1:nc + 2, :] + box_size
                idx += 1

        # center coordinates per batch element (same shift for i and j
        # keeps pair separations exact) so the Sw*xj - Sw*xi cancellation
        # happens at ~cell magnitude, not box magnitude (fp32 accuracy)
        cell = box_size / nc
        cxc = (cx.astype(jnp.float32) + 0.5) * cell
        cyc = (cy.astype(jnp.float32) + 0.5) * cell
        zoff = ((jax.lax.broadcasted_iota(jnp.int32, (nc, cap), 0)
                 .astype(jnp.float32) + 0.5) * cell)
        xi = rods[4, 0, 1:nc + 1, :] - cxc        # [nc, cap]
        yi = rods[4, 1, 1:nc + 1, :] - cyc
        zi = rods[4, 2, 1:nc + 1, :] - zoff

        def rod_step(r, accv):
            for sc in range(3):
                xj = rods[r, 0, sc:sc + nc, :] - cxc      # [nc, cap]
                yj = rods[r, 1, sc:sc + nc, :] - cyc
                zj = rods[r, 2, sc:sc + nc, :] - zoff
                mj = rods[r, 3, sc:sc + nc, :]
                dxt = xj[:, None, :] - xi[:, :, None]   # [nc, cap, cap]
                dyt = yj[:, None, :] - yi[:, :, None]
                dzt = zj[:, None, :] - zi[:, :, None]
                r2 = dxt * dxt + dyt * dyt + dzt * dzt + softening2
                inv_r = jax.lax.rsqrt(r2)
                x_split = (r2 * inv_r) * inv_2rs
                s = _poly_s(x_split)
                w = mj[:, None, :] * s * (inv_r * inv_r * inv_r)
                # Pj1[nc, cap, 4] = (xj, yj, zj, 1) in centered coords
                pj1 = jnp.stack(
                    [xj, yj, zj, jnp.ones_like(xj)], axis=-1)
                # HIGHEST: the MXU's default bf16 operand truncation is a
                # 0.4% force error on close pairs — f32 (bf16x3 passes)
                # keeps the GEMM exact at negligible cost (N=4)
                accv += jax.lax.dot_general(
                    w, pj1, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            return accv

        accv = jax.lax.fori_loop(
            0, 9, rod_step, jnp.zeros((nc, cap, 4), jnp.float32))
        out_ref[0] = accv[:, :, 0] - accv[:, :, 3] * xi
        out_ref[1] = accv[:, :, 1] - accv[:, :, 3] * yi
        out_ref[2] = accv[:, :, 2] - accv[:, :, 3] * zi
        out_ref[3] = jnp.zeros((nc, cap), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc + 2, cap), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9, 3)),
    )


def _short_kernel_v4(counts_ref, pts_hbm, out_ref, *, nc, cap, box_size,
                     rs, softening2, ch):
    """Paired-z-cell variant: TWO z-cells of capacity 64 share each
    128-lane row, so the assembled j row covers the 3-cell z window with
    2 paired rows = 18 lane-tiles instead of vpu3's 27 -- a 1.5x cut of
    the N*27*128 pair-slot floor that the module NOTE declared for
    cap=128 layouts (the premise this variant removes: a cap-64 cell no
    longer owns a whole 128-lane row). Addresses stay fully static: the
    z sweep is Python-unrolled and paired-row indices (zc+-1)>>1 are
    compile-time; i comes from the cell's 64-lane half-row.

    Layout: pts [4, nc^2, nc/2, 128] = the standard [C, 64] bucket
    arrays reshaped (cell (cx,cy,cz) occupies lanes (cz&1)*64..+64 of
    paired row cz>>1). Requires nc % 2 == 0 and capacity == 64.
    """
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    nrow = nc // 2
    h_lo, h_hi = nrow, nrow + 1     # halo rows: cells (-2,-1), (nc,nc+1)
    chq, v_scale, c1 = _poly_even_coeffs(rs)

    def body(rods, jrow, icol, accc, sem):
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    pts_hbm.at[:, r_id], rods.at[idx, :, pl.ds(0, nrow)],
                    sem.at[idx]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                # z halos are periodic wraps within the rod: register
                # copies + one-time z shift (cf. vpu3's halo planes)
                rods[idx, :, h_lo:h_lo + 1, :] = \
                    rods[idx, :, nrow - 1:nrow, :]
                rods[idx, :, h_hi:h_hi + 1, :] = rods[idx, :, 0:1, :]
                rods[idx, 2, h_lo:h_lo + 1, :] = \
                    rods[idx, 2, h_lo:h_lo + 1, :] - box_size
                rods[idx, 2, h_hi:h_hi + 1, :] = \
                    rods[idx, 2, h_hi:h_hi + 1, :] + box_size
                shift_x = jnp.where(cx + dx < 0, -box_size,
                                    jnp.where(cx + dx >= nc, box_size, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box_size,
                                    jnp.where(cy + dy >= nc, box_size, 0.0))
                rods[idx, 0] = rods[idx, 0] + shift_x
                rods[idx, 1] = rods[idx, 1] + shift_y
                idx += 1

        for zc in range(nc):
            # the 3-cell j window {zc-1, zc, zc+1} lives in 2 paired rows
            r_lo = h_lo if zc == 0 else (zc - 1) >> 1
            r_hi = h_hi if zc == nc - 1 else (zc + 1) >> 1
            for r in range(9):
                for p, zr in enumerate((r_lo, r_hi)):
                    off = (r * 2 + p) * 128
                    for comp in range(3):
                        jrow[comp:comp + 1, off:off + 128] = \
                            rods[r, comp, zr:zr + 1, :]
                    jrow[3:4, off:off + 128] = \
                        rods[r, 3, zr:zr + 1, :] * c1
            half = (zc & 1) * cap
            icol[0, :, :] = jnp.transpose(
                rods[4, 0, zc >> 1:(zc >> 1) + 1, half:half + cap])
            icol[1, :, :] = jnp.transpose(
                rods[4, 1, zc >> 1:(zc >> 1) + 1, half:half + cap])
            icol[2, :, :] = jnp.transpose(
                rods[4, 2, zc >> 1:(zc >> 1) + 1, half:half + cap])
            accc[...] = jnp.zeros_like(accc)

            cnt = counts_ref[i * nc + zc]
            kiq = (cnt + ch - 1) // ch

            def chunk(ci, _):
                s8 = pl.ds(ci * ch, ch)
                dxt = jrow[0:1, :] - icol[0, s8, :]     # [ch, 18*128]
                dyt = jrow[1:2, :] - icol[1, s8, :]
                dzt = jrow[2:3, :] - icol[2, s8, :]
                r2 = dxt * dxt + (dyt * dyt + (dzt * dzt + softening2))
                inv_r = jax.lax.rsqrt(r2)
                v = jnp.minimum(r2 * v_scale - 1.0, 1.0)
                q = jnp.full_like(v, chq[0])
                for c in chq[1:]:
                    q = q * v + c
                f = jnp.maximum((inv_r * inv_r) * inv_r + q, 0.0)
                w = jrow[3:4, :] * f
                accc[0, s8, :] = jnp.sum(w * dxt, axis=1, keepdims=True)
                accc[1, s8, :] = jnp.sum(w * dyt, axis=1, keepdims=True)
                accc[2, s8, :] = jnp.sum(w * dzt, axis=1, keepdims=True)
                return ()

            jax.lax.fori_loop(0, kiq, chunk, ())

            out_ref[0, zc >> 1:(zc >> 1) + 1, half:half + cap] = \
                jnp.transpose(accc[0, :, :])
            out_ref[1, zc >> 1:(zc >> 1) + 1, half:half + cap] = \
                jnp.transpose(accc[1, :, :])
            out_ref[2, zc >> 1:(zc >> 1) + 1, half:half + cap] = \
                jnp.transpose(accc[2, :, :])
        out_ref[3, :, :] = jnp.zeros((nc // 2, 128), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc // 2 + 2, 128), jnp.float32),
        jrow=pltpu.VMEM((4, 18 * 128), jnp.float32),
        icol=pltpu.VMEM((3, cap, 1), jnp.float32),
        accc=pltpu.VMEM((3, cap, 1), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9,)),
    )


def _short_kernel_v4b(counts_ref, pts_hbm, out_ref, *, nc, cap, box_size,
                      rs, softening2, ch):
    """vpu4 without the per-cell j-row assembly: the chunk body reads the
    18 paired-row tiles straight from the rods buffer (static slices),
    accumulates [ch, 128] per component in registers, and lane-reduces
    once per chunk. c1 is hoisted to the wrapper (a global pair-weight
    scale), and the center rod is transposed once per instance instead
    of once per cell. Tests the hypothesis that vpu4's per-cell fixed
    costs (72 single-sublane assembly copies + 3 transposes per cell at
    2.37x vpu3's cell count) eat the 1.35x pair-slot reduction."""
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    nrow = nc // 2
    h_lo, h_hi = nrow, nrow + 1
    chq, v_scale, _c1 = _poly_even_coeffs(rs)

    def body(rods, icolt, accx, accy, accz, sem):
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    pts_hbm.at[:, r_id], rods.at[idx, :, pl.ds(0, nrow)],
                    sem.at[idx]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                rods[idx, :, h_lo:h_lo + 1, :] = \
                    rods[idx, :, nrow - 1:nrow, :]
                rods[idx, :, h_hi:h_hi + 1, :] = rods[idx, :, 0:1, :]
                rods[idx, 2, h_lo:h_lo + 1, :] = \
                    rods[idx, 2, h_lo:h_lo + 1, :] - box_size
                rods[idx, 2, h_hi:h_hi + 1, :] = \
                    rods[idx, 2, h_hi:h_hi + 1, :] + box_size
                shift_x = jnp.where(cx + dx < 0, -box_size,
                                    jnp.where(cx + dx >= nc, box_size, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box_size,
                                    jnp.where(cy + dy >= nc, box_size, 0.0))
                rods[idx, 0] = rods[idx, 0] + shift_x
                rods[idx, 1] = rods[idx, 1] + shift_y
                idx += 1

        # center-rod i coordinates transposed ONCE per instance:
        # [nrow, 128] -> [128, nrow]; cell zc's column lives at
        # sublanes (zc&1)*64.. and lane zc>>1
        for comp in range(3):
            icolt[comp] = jnp.transpose(rods[4, comp, 0:nrow, :])

        for zc in range(nc):
            r_lo = h_lo if zc == 0 else (zc - 1) >> 1
            r_hi = h_hi if zc == nc - 1 else (zc + 1) >> 1
            half = (zc & 1) * cap
            row = zc >> 1

            cnt = counts_ref[i * nc + zc]
            kiq = (cnt + ch - 1) // ch
            accx[...] = jnp.zeros_like(accx)
            accy[...] = jnp.zeros_like(accy)
            accz[...] = jnp.zeros_like(accz)

            def chunk(ci, _, half=half, row=row, r_lo=r_lo, r_hi=r_hi):
                s8 = pl.ds(ci * ch, ch)
                # dynamic sublane ref-slices (half + ci*ch is 8-aligned)
                si = pl.ds(half + ci * ch, ch)
                icx = icolt[0, si, row:row + 1]
                icy = icolt[1, si, row:row + 1]
                icz = icolt[2, si, row:row + 1]
                ax = jnp.zeros((ch, 128), jnp.float32)
                ay = jnp.zeros((ch, 128), jnp.float32)
                az = jnp.zeros((ch, 128), jnp.float32)
                for r in range(9):
                    for zr in (r_lo, r_hi):
                        dxt = rods[r, 0, zr:zr + 1, :] - icx
                        dyt = rods[r, 1, zr:zr + 1, :] - icy
                        dzt = rods[r, 2, zr:zr + 1, :] - icz
                        r2 = dxt * dxt + (dyt * dyt
                                          + (dzt * dzt + softening2))
                        inv_r = jax.lax.rsqrt(r2)
                        v = jnp.minimum(r2 * v_scale - 1.0, 1.0)
                        q = jnp.full_like(v, chq[0])
                        for c in chq[1:]:
                            q = q * v + c
                        f = jnp.maximum((inv_r * inv_r) * inv_r + q, 0.0)
                        w = rods[r, 3, zr:zr + 1, :] * f
                        ax = ax + w * dxt
                        ay = ay + w * dyt
                        az = az + w * dzt
                accx[s8, :] = jnp.sum(ax, axis=1, keepdims=True)
                accy[s8, :] = jnp.sum(ay, axis=1, keepdims=True)
                accz[s8, :] = jnp.sum(az, axis=1, keepdims=True)
                return ()

            jax.lax.fori_loop(0, kiq, chunk, ())

            out_ref[0, row:row + 1, half:half + cap] = \
                jnp.transpose(accx[:, 0:1])
            out_ref[1, row:row + 1, half:half + cap] = \
                jnp.transpose(accy[:, 0:1])
            out_ref[2, row:row + 1, half:half + cap] = \
                jnp.transpose(accz[:, 0:1])
        out_ref[3, :, :] = jnp.zeros((nc // 2, 128), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc // 2 + 2, 128), jnp.float32),
        icolt=pltpu.VMEM((3, 128, nc // 2), jnp.float32),
        accx=pltpu.VMEM((cap, 1), jnp.float32),
        accy=pltpu.VMEM((cap, 1), jnp.float32),
        accz=pltpu.VMEM((cap, 1), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9,)),
    )


def _short_kernel_v2(pts_hbm, out_ref, *, nc, cap, box_size, rs,
                     softening2):
    """Optimized VPU variant. Differences from _short_kernel:

      * the split polynomial is evaluated via the endpoint-factored
        normalized-variable fit (_poly_r_coeffs): fewer VPU ops per pair
        AND ~15x better f32 accuracy than Horner on the raw polyfit
        coefficients (4.8e-5 vs 9.7e-3 max rel force error vs a float64
        truncated-split oracle);
      * per-lane accumulation: acc[nc, ci, cj] += w*d per tile (3 FMAs),
        with ONE cross-lane reduction after all 27 tiles instead of 27
        (saves ~3 ops/pair of log-shuffle reductions).

    Measured (1M, ncell=24, cap=128, v5e): 95 ms vs 112 ms for
    _short_kernel.
    """
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    ch, t_scale, r_max = _poly_r_coeffs(rs)

    def body(rods, sem):
        src = pts_hbm
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id], rods.at[idx, :, pl.ds(1, nc)],
                    sem.at[idx, 0]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(nc - 1, 1)],
                    rods.at[idx, :, pl.ds(0, 1)], sem.at[idx, 1]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(0, 1)],
                    rods.at[idx, :, pl.ds(nc + 1, 1)], sem.at[idx, 2]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                shift_x = jnp.where(cx + dx < 0, -box_size,
                                    jnp.where(cx + dx >= nc, box_size, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box_size,
                                    jnp.where(cy + dy >= nc, box_size, 0.0))
                rods[idx, 0] = rods[idx, 0] + shift_x
                rods[idx, 1] = rods[idx, 1] + shift_y
                rods[idx, 2, 0:1, :] = rods[idx, 2, 0:1, :] - box_size
                rods[idx, 2, nc + 1:nc + 2, :] = \
                    rods[idx, 2, nc + 1:nc + 2, :] + box_size
                idx += 1

        xi = rods[4, 0, 1:nc + 1, :]        # [nc, cap]
        yi = rods[4, 1, 1:nc + 1, :]
        zi = rods[4, 2, 1:nc + 1, :]

        def rod_step(r, acc):
            ax, ay, az = acc
            for sc in range(3):
                xj = rods[r, 0, sc:sc + nc, :]      # [nc, cap]
                yj = rods[r, 1, sc:sc + nc, :]
                zj = rods[r, 2, sc:sc + nc, :]
                mj = rods[r, 3, sc:sc + nc, :]
                # [nc, cap, cap]: i rides sublanes, j lanes (the inline
                # broadcast fuses; hoisting the transpose out of the loop
                # measured 2x SLOWER -- Mosaic relayouts the stored value
                # per tile)
                dxt = xj[:, None, :] - xi[:, :, None]
                dyt = yj[:, None, :] - yi[:, :, None]
                dzt = zj[:, None, :] - zi[:, :, None]
                r2 = dxt * dxt + dyt * dyt + dzt * dzt + softening2
                inv_r = jax.lax.rsqrt(r2)
                t = jnp.minimum(r2 * inv_r, r_max) * t_scale - 1.0
                h = jnp.full_like(t, ch[0])
                for c in ch[1:]:
                    h = h * t + c
                s = (1.0 - t) * h
                w = (mj[:, None, :] * s) * (inv_r * inv_r * inv_r)
                ax += w * dxt
                ay += w * dyt
                az += w * dzt
            return ax, ay, az

        zero3 = jnp.zeros((nc, cap, cap), jnp.float32)
        ax, ay, az = jax.lax.fori_loop(0, 9, rod_step,
                                       (zero3, zero3, zero3))
        out_ref[0] = jnp.sum(ax, axis=2)
        out_ref[1] = jnp.sum(ay, axis=2)
        out_ref[2] = jnp.sum(az, axis=2)
        out_ref[3] = jnp.zeros((nc, cap), jnp.float32)

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc + 2, cap), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9, 3)),
    )


def _short_kernel(pts_hbm, out_ref, *, nc, cap, box_size, rs, softening2):
    i = pl.program_id(0)
    cx = i // nc
    cy = i % nc
    inv_2rs = 1.0 / (2.0 * rs)

    def body(rods, sem):
        # rods: [9, 4, nc+2, cap] VMEM; pts_hbm arrives pre-shaped
        # [4, nc*nc, nc, cap] so DMA slices index leading dims only.
        src = pts_hbm
        dmas = []
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                r_id = ((cx + dx) % nc) * nc + ((cy + dy) % nc)
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id], rods.at[idx, :, pl.ds(1, nc)],
                    sem.at[idx, 0]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(nc - 1, 1)],
                    rods.at[idx, :, pl.ds(0, 1)], sem.at[idx, 1]))
                dmas.append(pltpu.make_async_copy(
                    src.at[:, r_id, pl.ds(0, 1)],
                    rods.at[idx, :, pl.ds(nc + 1, 1)], sem.at[idx, 2]))
                idx += 1
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        # periodic unwrap ONCE per rod instead of min-image per pair tile
        # (saves 9 VPU ops per interaction): x/y shifts when the (dx, dy)
        # neighbor wrapped around the box; z halo rows always wrap.
        idx = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                # cx/cy are traced (program_id): use where on scalars
                shift_x = jnp.where(cx + dx < 0, -box_size,
                                    jnp.where(cx + dx >= nc, box_size, 0.0))
                shift_y = jnp.where(cy + dy < 0, -box_size,
                                    jnp.where(cy + dy >= nc, box_size, 0.0))
                rods[idx, 0] = rods[idx, 0] + shift_x
                rods[idx, 1] = rods[idx, 1] + shift_y
                rods[idx, 2, 0:1, :] = rods[idx, 2, 0:1, :] - box_size
                rods[idx, 2, nc + 1:nc + 2, :] = \
                    rods[idx, 2, nc + 1:nc + 2, :] + box_size
                idx += 1

        # whole-rod tiles: all nc cells of the center rod interact at once
        # with the sc-shifted window of each neighbor rod. fori_loop over
        # rods keeps one reusable set of [nc, cap, cap] temporaries.
        xi = rods[4, 0, 1:nc + 1, :]        # [nc, cap]
        yi = rods[4, 1, 1:nc + 1, :]
        zi = rods[4, 2, 1:nc + 1, :]

        def rod_step(r, acc):
            ax, ay, az = acc
            for sc in range(3):
                xj = rods[r, 0, sc:sc + nc, :]      # [nc, cap]
                yj = rods[r, 1, sc:sc + nc, :]
                zj = rods[r, 2, sc:sc + nc, :]
                mj = rods[r, 3, sc:sc + nc, :]
                dxt = xj[:, None, :] - xi[:, :, None]   # [nc, cap, cap]
                dyt = yj[:, None, :] - yi[:, :, None]
                dzt = zj[:, None, :] - zi[:, :, None]
                r2 = dxt * dxt + dyt * dyt + dzt * dzt + softening2
                inv_r = jax.lax.rsqrt(r2)
                x_split = (r2 * inv_r) * inv_2rs
                s = _poly_s(x_split)
                w = mj[:, None, :] * s * (inv_r * inv_r * inv_r)
                ax += jnp.sum(w * dxt, axis=2)
                ay += jnp.sum(w * dyt, axis=2)
                az += jnp.sum(w * dzt, axis=2)
            return ax, ay, az

        zero = jnp.zeros((nc, cap), jnp.float32)
        ax, ay, az = jax.lax.fori_loop(0, 9, rod_step, (zero, zero, zero))
        out_ref[0] = ax
        out_ref[1] = ay
        out_ref[2] = az
        out_ref[3] = zero

    pl.run_scoped(
        body,
        rods=pltpu.VMEM((9, 4, nc + 2, cap), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((9, 3)),
    )


@functools.partial(jax.jit, static_argnames=(
    "ncell", "capacity", "box_size", "rs", "softening", "interpret",
    "variant", "i_chunk"))
def pallas_short_range(bpos, bmass, *, ncell: int, capacity: int,
                       box_size: float, rs: float, softening: float,
                       interpret: bool = False, variant: str = "vpu3",
                       i_chunk: int = 16):
    """Short-range accelerations for every bucket slot.

    bpos is SoA [3, C, K] (native; returns [3, C, K]) or legacy AoS
    [C, K, 3] (returns [C, K, 3]); bmass [C, K] in the treepm bucket
    layout (C = ncell^3, z-major cell ids). SoA is the production form:
    [.., .., 3]-minor arrays can make XLA materialize (8,128)-tiled
    copies whose minor dim pads 42x (29 GB at the 1M/cap-4096 science
    geometry). Requires ncell >= 3 (the 27-stencil), capacity a
    multiple of 8, and softening > 0.

    The default (vpu3) variant additionally requires LIVE-FIRST buckets
    (live slots at rank 0..n_c-1, as produced by bucket_particles): its
    per-cell i loops cover only ceil(live/chunk) chunks, so live
    particles parked after a dead slot would be skipped. Slots past the
    live count get exactly zero output (dead slots are inert padding
    everywhere downstream). Measured 1M/v5e: 66.3 ms vs 96.7 (vpu2).

    The vpu4 variant (capacity == 64, ncell even, live-first) pairs two
    z-cells per 128-lane row, cutting the assembled j row from 27 to 18
    lane-tiles -- use when the plan's occupancy fits 64 slots/cell.
    `i_chunk` sets its i sublane chunk rows (8-multiple dividing 64).
    """
    if ncell < 3:
        raise ValueError("pallas_short_range needs ncell >= 3")
    if softening <= 0:
        raise ValueError("softening must be > 0")
    if capacity % 8:
        raise ValueError("capacity must be a multiple of 8")
    cc = ncell ** 3
    cap = capacity
    # SoA input [3, C, K] is the native form: ANY [.., .., 3]-minor
    # array can make XLA materialize an (8,128)-tiled copy whose minor
    # dim of 3 pads to 128 lanes -- a 42x blowup (measured: 29 GB OOM
    # at [13824, 4096, 3], the 1M/cap-4096 science geometry; the
    # choice is consumer-driven and opaque, so the fast path never
    # crosses this function with AoS). Legacy [C, K, 3] is detected by
    # the trailing dim and converted (CPU tests / small mesh states).
    legacy_aos = (bpos.ndim == 3 and bpos.shape[-1] == 3
                  and bpos.shape[0] != 3)
    if legacy_aos:
        comps = [bpos[..., k].reshape(cc * cap) for k in range(3)]
    else:
        comps = [bpos.reshape(3, cc * cap)[k] for k in range(3)]
    pts = jnp.stack(
        [c.astype(jnp.float32) for c in comps]
        + [bmass.reshape(cc * cap).astype(jnp.float32)], axis=0)

    counts = None
    if variant in ("vpu3", "vpu4", "vpu4b", "vpu5"):
        # live-first bucket counts (bucket_particles packs live slots at
        # rank 0..n_c): drives the dynamic per-cell i-chunk trip counts.
        # counts go to SMEM FLAT [C]: a 2D [ncell^2, ncell] SMEM array
        # pads its minor dim to 128 lanes (1.18 MB at ncell=48, over the
        # ~1 MB SMEM budget), and blocked SMEM specs need 8/128-divisible
        # blocks; a 1-D scalar array stays unpadded (4 B/cell) and takes
        # dynamic indices
        counts = jnp.sum(bmass.reshape(cc, cap) > 0, axis=1) \
            .astype(jnp.int32)

    if variant in ("vpu4", "vpu4b"):
        if capacity != 64:
            raise ValueError("vpu4 requires capacity == 64")
        if ncell % 2:
            raise ValueError("vpu4 requires an even ncell")
        if i_chunk % 8 or 64 % i_chunk:
            raise ValueError("i_chunk must be a multiple of 8 dividing 64")
        pts = pts.reshape(4, ncell * ncell, ncell // 2, 128)
        kernel = functools.partial(
            _short_kernel_v4 if variant == "vpu4" else _short_kernel_v4b,
            nc=ncell, cap=cap,
            box_size=float(box_size), rs=float(rs),
            softening2=float(softening) ** 2, ch=i_chunk)
        out = pl.pallas_call(
            kernel,
            grid=(ncell * ncell,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((4, ncell // 2, 128),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (4, cc // 2, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=cc * cap * 18 * 128 * 40 // 64,
                bytes_accessed=cc * cap * 16 * 10,
                transcendentals=cc * cap * 18 * 128 // 64,
            ),
            interpret=interpret,
        )(counts, pts)
        out = out.reshape(4, cc, cap)[0:3]
        if variant == "vpu4b":
            # c1 (the truncated-split normalization) is a global pair
            # scale: applied once here instead of per assembly copy
            out = out * _poly_even_coeffs(float(rs))[2]
        # SoA callers get [3, C, K]: the AoS transpose is exactly the
        # padded-relayout trap the SoA interface exists to avoid
        return out.transpose(1, 2, 0) if legacy_aos else out

    pts = pts.reshape(4, ncell * ncell, ncell, cap)
    kfn = {"vpu": _short_kernel, "mxu": _short_kernel_mxu,
           "vpu2": _short_kernel_v2, "vpu3": _short_kernel_v3,
           "vpu5": _short_kernel_v5}[variant]
    kernel = functools.partial(
        kfn, nc=ncell, cap=cap, box_size=float(box_size),
        rs=float(rs), softening2=float(softening) ** 2)

    operands = [pts]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if variant == "vpu3":
        operands = [counts, pts]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]
    elif variant == "vpu5":
        if capacity % 128:
            raise ValueError("vpu5 requires capacity % 128 == 0 "
                             "(128-lane DMA/j chunks)")
        # per-rod DMA window: ceil(max cell occupancy in the rod / 128)
        rodchunks = jnp.maximum(
            (counts.reshape(ncell * ncell, ncell).max(axis=1) + 127)
            // 128, 1).astype(jnp.int32)
        operands = [counts, rodchunks, pts]
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]

    out = pl.pallas_call(
        kernel,
        grid=(ncell * ncell,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((4, ncell, cap), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, cc, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # 127M: vpu5 at grown caps needs the headroom (cap 8192 at
            # ncell 24 measured 113.8M scoped; v5e VMEM is 128M). The
            # ceiling caps vpu5 at ~8192 for nc<=26 -- growth beyond
            # that OOMs at compile, by design loudly
            vmem_limit_bytes=127 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=cc * cap * 27 * cap * 40,
            bytes_accessed=cc * cap * 16 * 10,
            transcendentals=cc * cap * 27 * cap,
        ),
        interpret=interpret,
    )(*operands)
    return out[0:3].transpose(1, 2, 0) if legacy_aos else out[0:3]
