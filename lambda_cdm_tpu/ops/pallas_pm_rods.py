"""Pallas TPU kernels: rod-resident fused CIC x fd4 PM gather and deposit.

The block-extracted PM pipeline (ops/bucketed_pm + ops/pallas_pm) spends
most of its time OUTSIDE the GEMMs: three full-grid fd4 roll-stencils,
three [C, L^3] block extractions and one block assembly are all XLA
dense-copy passes over ~300 MB of intermediates (~65 ms of the ~90 ms PM
stage at 1M/192^3 on v5e). These kernels remove every intermediate by
working per (cx, cy) rod with the z axis kept GLOBAL:

  gather   one DMA of a [La, La, ng] potential window per rod (the x/y
           periodic halo is pre-padded, so origins are static-shape
           dynamic slices on leading dims -- no wrap splitting); the z
           interpolation one-hot Z[ng, S] spans the full z axis, so the
           z contraction is ONE MXU GEMM per rod -- and the fd4 gradient
           collapses into a second GEMM against Z' = fd4 (x) Z (built
           with 4 pltpu.rolls, which also gives periodic z for free).
           In x/y the gradient similarly folds into shifted one-hots
           X' = fd4 (x) X. No gradient grids, no extraction, no rolls.

  deposit  the transpose: local[ab, z] = (X x Y)^T[ab, S] @ Zm[S, ng]
           per rod; only the x/y ghost fold + block transpose remain in
           XLA (z needs no fold at all).

Force convention: returns ACCELERATIONS = -grad phi interpolated, i.e.
F_x(p) = -sum_g CIC(p,g) fd4_x[phi](g), rewritten as a gather of phi with
the fd4-convolved weight sum_s d_s CIC(p, g - s e_x).

Replaces the reference's per-particle trilinear force gather + finite
difference on G-grids (SURVEY.md section 2.2 particle_mesh pipeline) at
TPU-native cost.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def rod_geometry(ng: int, ncell: int, margin: int):
    """(ppc, ell, la, halo): PM cells per bucket cell, CIC window edge,
    fd4+CIC window edge, and the x/y pad width."""
    if ng % ncell:
        raise ValueError(f"PM grid {ng} must be a multiple of ncell {ncell}")
    ppc = ng // ncell
    ell = ppc + 2 * (margin + 1)          # CIC support window
    halo = margin + 3                     # CIC margin + fd4's +-2
    return ppc, ell, ppc + 2 * halo, halo


def _fd4_coeffs(h: float):
    """(shift, weight) pairs of the 4th-order first derivative:
    f'(g) = sum_s d_s f(g+s), d_{+-1} = +-8/12h, d_{+-2} = -+1/12h."""
    return ((-2, 1.0 / (12.0 * h)), (-1, -8.0 / (12.0 * h)),
            (1, 8.0 / (12.0 * h)), (2, -1.0 / (12.0 * h)))


def _onehot_la(idx, frac, *, la, s):
    """[La, S] per-axis CIC one-hot: row a = (1-f) at a==idx, f at idx+1."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (la, s), 0).astype(jnp.float32)
    return (jnp.where(iota == idx, 1.0 - frac, 0.0)
            + jnp.where(iota == idx + 1.0, frac, 0.0))


def _dot_f32(a, b, gemm: str):
    """[M, K] @ [K, N] -> f32. gemm="highest": Mosaic's 6-pass exact
    f32. gemm="bf16x3": manual 3-pass split (a_hi+a_lo)(b_hi) + a_hi b_lo
    -- ~1.5e-5 relative, half the MXU passes of HIGHEST and far below
    the CIC/fd4 truncation error this module's kernels carry."""
    dims = (((1,), (0,)), ((), ()))
    if gemm == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=HIGHEST)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(a_hi, b_hi, dims,
                              preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(a_lo, b_hi, dims,
                               preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(a_hi, b_lo, dims,
                               preferred_element_type=jnp.float32)
    return out


def _gather_kernel(phi_hbm, pos_ref, out_ref, *, nc, cap, ng, ng_p, ppc,
                   la, ly, g8, halo, box_size, margin, h, s, gemm):
    """Grid (rod, slot-chunk): each instance gathers `s` slots of one
    (cx, cy) rod. Chunking the slot axis keeps the one-hot + GEMM
    working set ~4 MB (a whole 24*128-slot rod at once needs ~14 MB,
    over the 16 MB VMEM budget)."""
    rod = pl.program_id(0)
    chunk0 = pl.program_id(1) * s
    cx = rod // nc
    cy = rod % nc
    ell = ppc + 2 * (margin + 1)

    def body(win, sem):
        # phi arrives 5D [P, X, Y/8, 8, ng]: P phase-shifted replicas of
        # the padded grid (replica p's rows start g8*p rows later), so
        # EVERY rod's y window starts 8-block-aligned in the replica
        # whose phase matches its origin cy*ppc % 8 -- the window is the
        # tight round_up(la, 8) rows instead of the +7-row down-aligned
        # slack (at ppc=6 that slack made the GEMM M dim 24 rows vs 16:
        # +50% MXU passes). Both window axes stay LEADING (untiled)
        # dims -- a dynamic slice on the sublane dim itself crashes the
        # Mosaic backend even 8-aligned.
        y0 = cy * ppc
        py = y0 - (y0 // 8) * 8          # phase: a multiple of g8
        dma = pltpu.make_async_copy(
            phi_hbm.at[py // g8, pl.ds(cx * ppc, la),
                       pl.ds((y0 - py) // 8, ly // 8)],
            win, sem)
        dma.start()

        pos = pos_ref[:]                   # [3, s] (this chunk's slots)
        u = pos * (ng / box_size)
        i0 = jnp.floor(u - 0.5)
        frac = (u - 0.5) - i0              # [3, S]

        # validity: same drift-margin rule as the deposit (local CIC
        # window in all three axes); invalid slots gather zero force.
        # slot ids are global within the rod: chunk0 + [0, s)
        zc = ((jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) + chunk0)
              // cap).astype(jnp.float32)[0]
        org = jnp.stack([
            jnp.full((s,), (cx * ppc - (margin + 1)), jnp.float32),
            jnp.full((s,), (cy * ppc - (margin + 1)), jnp.float32),
            zc * ppc - (margin + 1),
        ])
        il = i0 - org
        ok = jnp.where(
            jnp.all((il >= 0) & (il <= ell - 2), axis=0), 1.0, 0.0)

        # x/y one-hots in window coords (origin c*ppc - halo; the
        # replica phase makes the y window start exactly there)
        ax = (i0[0] - (cx * ppc - halo))[None, :]
        ay = (i0[1] - (cy * ppc - halo))[None, :]
        x1 = _onehot_la(ax, frac[0][None, :], la=la, s=s)
        y1 = _onehot_la(ay, frac[1][None, :], la=ly, s=s)

        def fdconv_la(base):
            out = jnp.zeros_like(base)
            for sh, wgt in _fd4_coeffs(h):
                # pltpu.roll wants a non-negative shift
                out += wgt * pltpu.roll(base, sh % base.shape[0], axis=0)
            return out

        # fd4 (x) CIC along x/y: shifted sums of the one-hot. pltpu.roll
        # wraps rows across the window edge, but valid slots keep their
        # 6-point footprint >= 2 rows from either edge (halo = margin+3),
        # so wrapped rows only ever receive zeros.
        x4 = fdconv_la(x1)
        y4 = fdconv_la(y1)

        # z one-hots over the FULL (periodic) z axis, transposed
        # [ng_p, S] (z padded to a whole number of 128-lane pairs: a DMA
        # whose minor dim is 1.5 lane-tiles crashes the Mosaic backend;
        # rows >= ng stay zero).
        izf = i0[2] - jnp.floor(i0[2] / ng) * ng      # wrap to [0, ng)
        iz = izf[None, :]
        fz = (frac[2] * ok)[None, :]                  # mask folds in here
        okz = ok[None, :]

        if ng % 8 == 0 and ng_p > ng:
            # build ONE unpadded [ng, S] one-hot (sublane rows = true z
            # axis, multiple of 8) -- pltpu.roll then wraps at ng, so
            # the fd4 z-convolution is 4 cheap rolls instead of 4 more
            # full one-hot builds (the build is ~10 VPU passes each;
            # measured 20.2 -> ~13 ms for the 1M gather)
            ziota_n = (jax.lax.broadcasted_iota(jnp.int32, (ng, s), 0)
                       .astype(jnp.float32))
            b = jnp.where(iz + 1.0 == ng, 0.0, iz + 1.0)
            zt_n = (jnp.where(ziota_n == iz, okz - fz, 0.0)
                    + jnp.where(ziota_n == b, fz, 0.0))
            z4_n = jnp.zeros_like(zt_n)
            for sh, wgt in _fd4_coeffs(h):
                z4_n += wgt * pltpu.roll(zt_n, sh % ng, axis=0)
            zpad = jnp.zeros((ng_p - ng, s), jnp.float32)
            zt = jnp.concatenate([zt_n, zpad], axis=0)
            z4 = jnp.concatenate([z4_n, zpad], axis=0)
        else:
            ziota = (jax.lax.broadcasted_iota(jnp.int32, (ng_p, s), 0)
                     .astype(jnp.float32))

            def z_onehot(shift):
                a = iz + shift
                a = a - jnp.floor(a / ng) * ng
                bb = iz + 1.0 + shift
                bb = bb - jnp.floor(bb / ng) * ng
                return (jnp.where(ziota == a, okz - fz, 0.0)
                        + jnp.where(ziota == bb, fz, 0.0))

            zt = z_onehot(0.0)
            z4 = jnp.zeros_like(zt)
            for sh, wgt in _fd4_coeffs(h):
                z4 += wgt * z_onehot(float(sh))

        dma.wait()
        w2 = win[:].reshape(la * ly, ng_p)

        # MXU: z contraction for all slots at once (plain DEFAULT bf16
        # operand truncation would be a ~0.4% force error)
        g1 = _dot_f32(w2, zt, gemm)                   # [La*Ly, S]
        g4 = _dot_f32(w2, z4, gemm)
        g1 = g1.reshape(la, ly, s)
        g4 = g4.reshape(la, ly, s)

        # contract b (y) then a (x) on the VPU
        t_y = jnp.sum(g1 * y1[None, :, :], axis=1)    # [La, S]
        t_y4 = jnp.sum(g1 * y4[None, :, :], axis=1)
        t4_y = jnp.sum(g4 * y1[None, :, :], axis=1)
        out_ref[0] = -jnp.sum(t_y * x4, axis=0)       # [S]
        out_ref[1] = -jnp.sum(t_y4 * x1, axis=0)
        out_ref[2] = -jnp.sum(t4_y * x1, axis=0)

    pl.run_scoped(
        body,
        win=pltpu.VMEM((la, ly // 8, 8, ng_p), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("ncell", "ng", "margin",
                                              "box_size", "interpret",
                                              "gemm"))
def pallas_gather_fd4(phi, bpos, *, ncell: int, ng: int, box_size,
                      margin: int = 1, interpret: bool = False,
                      gemm: str = "bf16x3", counts=None):
    """Accelerations = -(fd4 grad of phi) CIC-interpolated at every
    bucketed particle -> [C, K, 3], in ONE fused kernel (no gradient
    grids, no block extraction).

    phi [ng, ng, ng]; bpos [C, K, 3] in the treepm bucket layout.

    With `counts` (int32 [C] live-slot counts per bucket, LIVE-FIRST
    packing as produced by bucket_particles), the occupancy-aware
    variant runs: rank-major slot ordering + dynamic per-rod chunk trip
    counts skip the dead capacity padding entirely (~25% of the slots
    at the 1M bench geometry, far more for clustered/grown-capacity
    states). Dead slots get exactly zero output either way.
    """
    cc = ncell ** 3
    soa = bpos.ndim == 3 and bpos.shape[0] == 3 and bpos.shape[1] == cc
    cap = bpos.shape[-1] if soa else bpos.shape[1]
    ppc, ell, la, halo = rod_geometry(ng, ncell, margin)
    h = float(box_size) / ng

    # y window rows: the tight round_up(la, 8). Per-rod y origins cy*ppc
    # are NOT 8-block aligned when ppc % 8 != 0; instead of down-aligning
    # the DMA start (which costs up to +7 extra window rows -> +50% GEMM
    # M passes at ppc=6), the padded grid is replicated at every origin
    # PHASE (multiples of g8 = gcd(ppc, 8); 8/g8 replicas), and each rod
    # DMAs from the replica where its window start IS block-aligned.
    ly = la if la % 8 == 0 else ((la + 7) // 8) * 8
    g8 = math.gcd(ppc, 8)
    n_ph = 8 // g8
    # periodic x/y halo (z stays global inside the kernel); y padded far
    # enough that the LAST rod's window fits in the LAST-phase replica;
    # z ZERO-padded to a multiple of 256 lanes (partial lane-tile DMAs
    # crash Mosaic; the kernel's one-hot indices never touch the pad)
    base_y = ng + 2 * halo
    yrep = ((((ncell - 1) * ppc) + ly + 7) // 8) * 8   # rows per replica
    ypad = max(0, (n_ph - 1) * g8 + yrep - base_y)
    zpad = (-ng) % 256
    ng_p = ng + zpad
    phi_pad = jnp.pad(phi, ((halo, halo), (halo, halo + ypad), (0, 0)),
                      mode="wrap")
    phi_pad = jnp.pad(phi_pad, ((0, 0), (0, 0), (0, zpad)))
    if n_ph == 1:
        phi_pad = phi_pad[:, :yrep][None]
    else:
        phi_pad = jnp.stack([phi_pad[:, p * g8:p * g8 + yrep]
                             for p in range(n_ph)])
    phi_pad = phi_pad.reshape(n_ph, ng + 2 * halo, yrep // 8, 8, ng_p)

    rr = ncell * ncell
    s_rod = ncell * cap

    if counts is not None:
        # occupancy path: RANK-MAJOR slots (slot = rank*nc + bucket_z),
        # chunk axis hoisted to a leading (untiled) dim so the in-kernel
        # fori_loop indexes it dynamically
        s = min(s_rod, 256)
        while s_rod % s:
            s -= 128
        nchunks = s_rod // s
        rod_counts = (counts.reshape(rr, ncell).max(axis=1)
                      .astype(jnp.int32))
        if soa:
            # SoA [3, C, K]: rank-major slots without ever materializing
            # a [.., .., 3]-minor intermediate (XLA can relayout those
            # into 42x lane-padded tilings; 29 GB at 1M/cap 4096)
            pos_t = (bpos.reshape(3, rr, ncell, cap)
                     .transpose(1, 0, 3, 2)           # [rr, 3, cap, nc]
                     .reshape(rr, 3, nchunks, s).transpose(0, 2, 1, 3))
        else:
            pos_t = (bpos.reshape(rr, ncell, cap, 3)
                     .transpose(0, 2, 1, 3)
                     .reshape(rr, nchunks, s, 3).transpose(0, 1, 3, 2))
        kernel = functools.partial(
            _gather_kernel_occ, nc=ncell, ng=ng, ng_p=ng_p, ppc=ppc,
            la=la, ly=ly, g8=g8, halo=halo, box_size=float(box_size),
            margin=margin, h=h, s=s, nchunks=nchunks, gemm=gemm)
        out = pl.pallas_call(
            kernel,
            grid=(rr,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, nchunks, 3, s), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nchunks, 3, s),
                                   lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((rr, nchunks, 3, s),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((la, ly // 8, 8, ng_p), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=cc * cap * (2 * la * la * ng // ncell
                                  + 6 * la * la),
                bytes_accessed=rr * la * la * ng * 4 + cc * cap * 28,
                transcendentals=0,
            ),
            interpret=interpret,
        )(rod_counts, phi_pad, pos_t)
        if soa:
            return (out.transpose(2, 0, 1, 3)      # [3, rr, nchunks, s]
                    .reshape(3, rr, cap, ncell).transpose(0, 1, 3, 2)
                    .reshape(3, cc, cap))
        return (out.transpose(0, 1, 3, 2).reshape(rr, cap, ncell, 3)
                .transpose(0, 2, 1, 3).reshape(cc, cap, 3))

    # [3, R*S] flat rod-major slot layout (cell ids are z-major): the
    # per-chunk block (3, s) then satisfies Mosaic's trailing-dims rule
    s = min(s_rod, 1024)
    while s_rod % s:
        s -= 128
    nchunks = s_rod // s
    pos_t = (bpos.reshape(3, rr * s_rod) if soa else
             bpos.reshape(rr, s_rod, 3).transpose(2, 0, 1)
             .reshape(3, rr * s_rod))

    kernel = functools.partial(
        _gather_kernel, nc=ncell, cap=cap, ng=ng, ng_p=ng_p, ppc=ppc,
        la=la, ly=ly, g8=g8, halo=halo, box_size=float(box_size),
        margin=margin, h=h, s=s, gemm=gemm)
    out = pl.pallas_call(
        kernel,
        grid=(rr, nchunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, s), lambda i, j: (0, i * nchunks + j)),
        ],
        out_specs=pl.BlockSpec((3, s), lambda i, j: (0, i * nchunks + j)),
        out_shape=jax.ShapeDtypeStruct((3, rr * s_rod), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=cc * cap * (2 * la * la * ng // ncell + 6 * la * la),
            bytes_accessed=ncell * ncell * la * la * ng * 4 + cc * cap * 28,
            transcendentals=0,
        ),
        interpret=interpret,
    )(phi_pad, pos_t)
    out = out.reshape(3, cc, cap)
    return out if soa else out.transpose(1, 2, 0)


def _gather_kernel_occ(counts_ref, phi_hbm, pos_ref, out_ref, win, sem, *,
                       nc, ng, ng_p, ppc, la, ly, g8, halo, box_size,
                       margin, h, s, nchunks, gemm):
    """Occupancy-aware gather: grid (rod,), slots RANK-MAJOR within the
    rod (slot = rank * nc + bucket_z), chunk loop with a DYNAMIC trip
    count ceil(rod_max_count * nc / s) from SMEM. Bucket layouts pack
    live slots first, so rank-major ordering concentrates every live
    slot in the leading chunks and the dead capacity padding (the
    128-multiple quantization + clustering headroom) is never touched.
    The potential window DMA also runs ONCE per rod instead of once per
    chunk. Same math as _gather_kernel otherwise (incl. the phase
    replica selection -- see that kernel's window note)."""
    rod = pl.program_id(0)
    cx = rod // nc
    cy = rod % nc
    ell = ppc + 2 * (margin + 1)
    live = counts_ref[rod] * nc
    trips = (live + s - 1) // s

    y0 = cy * ppc
    py = y0 - (y0 // 8) * 8
    dma = pltpu.make_async_copy(
        phi_hbm.at[py // g8, pl.ds(cx * ppc, la),
                   pl.ds((y0 - py) // 8, ly // 8)],
        win, sem)
    dma.start()
    # skipped (all-dead) chunks must still output zeros
    out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)
    dma.wait()
    w2 = win[:].reshape(la * ly, ng_p)

    def chunk(k, carry):
        chunk0 = k * s
        pos = pos_ref[0, k]                # [3, s]
        u = pos * (ng / box_size)
        i0 = jnp.floor(u - 0.5)
        frac = (u - 0.5) - i0              # [3, S]

        # rank-major slot -> bucket z index: slot % nc
        j = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) + chunk0
        zc = (j - (j // nc) * nc).astype(jnp.float32)[0]
        org = jnp.stack([
            jnp.full((s,), (cx * ppc - (margin + 1)), jnp.float32),
            jnp.full((s,), (cy * ppc - (margin + 1)), jnp.float32),
            zc * ppc - (margin + 1),
        ])
        il = i0 - org
        ok = jnp.where(
            jnp.all((il >= 0) & (il <= ell - 2), axis=0), 1.0, 0.0)

        ax = (i0[0] - (cx * ppc - halo))[None, :]
        ay = (i0[1] - (cy * ppc - halo))[None, :]
        x1 = _onehot_la(ax, frac[0][None, :], la=la, s=s)
        y1 = _onehot_la(ay, frac[1][None, :], la=ly, s=s)

        def fdconv_la(base):
            out = jnp.zeros_like(base)
            for sh, wgt in _fd4_coeffs(h):
                out += wgt * pltpu.roll(base, sh % base.shape[0], axis=0)
            return out

        x4 = fdconv_la(x1)
        y4 = fdconv_la(y1)

        izf = i0[2] - jnp.floor(i0[2] / ng) * ng
        iz = izf[None, :]
        fz = (frac[2] * ok)[None, :]
        okz = ok[None, :]

        if ng % 8 == 0 and ng_p > ng:
            ziota_n = (jax.lax.broadcasted_iota(jnp.int32, (ng, s), 0)
                       .astype(jnp.float32))
            b = jnp.where(iz + 1.0 == ng, 0.0, iz + 1.0)
            zt_n = (jnp.where(ziota_n == iz, okz - fz, 0.0)
                    + jnp.where(ziota_n == b, fz, 0.0))
            z4_n = jnp.zeros_like(zt_n)
            for sh, wgt in _fd4_coeffs(h):
                z4_n += wgt * pltpu.roll(zt_n, sh % ng, axis=0)
            zpad = jnp.zeros((ng_p - ng, s), jnp.float32)
            zt = jnp.concatenate([zt_n, zpad], axis=0)
            z4 = jnp.concatenate([z4_n, zpad], axis=0)
        else:
            ziota = (jax.lax.broadcasted_iota(jnp.int32, (ng_p, s), 0)
                     .astype(jnp.float32))

            def z_onehot(shift):
                a = iz + shift
                a = a - jnp.floor(a / ng) * ng
                bb = iz + 1.0 + shift
                bb = bb - jnp.floor(bb / ng) * ng
                return (jnp.where(ziota == a, okz - fz, 0.0)
                        + jnp.where(ziota == bb, fz, 0.0))

            zt = z_onehot(0.0)
            z4 = jnp.zeros_like(zt)
            for sh, wgt in _fd4_coeffs(h):
                z4 += wgt * z_onehot(float(sh))

        g1 = _dot_f32(w2, zt, gemm)                   # [La*Ly, S]
        g4 = _dot_f32(w2, z4, gemm)
        g1 = g1.reshape(la, ly, s)
        g4 = g4.reshape(la, ly, s)

        t_y = jnp.sum(g1 * y1[None, :, :], axis=1)    # [La, S]
        t_y4 = jnp.sum(g1 * y4[None, :, :], axis=1)
        t4_y = jnp.sum(g4 * y1[None, :, :], axis=1)
        out_ref[0, k, 0] = -jnp.sum(t_y * x4, axis=0)
        out_ref[0, k, 1] = -jnp.sum(t_y4 * x1, axis=0)
        out_ref[0, k, 2] = -jnp.sum(t4_y * x1, axis=0)
        return carry

    jax.lax.fori_loop(0, trips, chunk, 0)


def _deposit_kernel(pos_ref, mass_ref, out_ref, *, nc, cap, ng, ppc, ell,
                    box_size, margin, gemm):
    rod = pl.program_id(0)
    cx = rod // nc
    cy = rod % nc
    s = nc * cap

    pos = pos_ref[:]                       # [3, S]
    mass = mass_ref[:]                     # [S]
    u = pos * (ng / box_size)
    i0 = jnp.floor(u - 0.5)
    frac = (u - 0.5) - i0

    # z-cell id per slot via a [1, S] iota // cap (the [nc, cap]-iota
    # reshape to 1D is an unsupported Mosaic shape cast when cap is not
    # exactly one 128-lane tile -- hit at the 10M config's cap=256)
    org = jnp.stack([
        jnp.full((s,), (cx * ppc - (margin + 1)), jnp.float32),
        jnp.full((s,), (cy * ppc - (margin + 1)), jnp.float32),
        ((jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) // cap)
         .astype(jnp.float32)[0] * ppc - (margin + 1)),
    ])
    il = i0 - org
    ok = jnp.all((il >= 0) & (il <= ell - 2), axis=0)
    w = jnp.where(ok & (mass > 0), mass, 0.0)

    ax = il[0][None, :]
    ay = il[1][None, :]
    x1 = _onehot_la(ax, frac[0][None, :], la=ell, s=s)     # [L, S]
    y1 = _onehot_la(ay, frac[1][None, :], la=ell, s=s)

    # z one-hot over full z, mass folded in; wrap like the gather
    izf = i0[2] - jnp.floor(i0[2] / ng) * ng
    iz = izf[None, :]
    fz = frac[2][None, :]
    ziota = (jax.lax.broadcasted_iota(jnp.int32, (s, ng), 1)
             .astype(jnp.float32))
    izp1 = jnp.where(iz + 1.0 == ng, 0.0, iz + 1.0)
    zm = (jnp.where(ziota == iz.T, 1.0 - fz.T, 0.0)
          + jnp.where(ziota == izp1.T, fz.T, 0.0)) * w[:, None]  # [S, ng]

    # outer product [L^2, S] then ONE MXU GEMM -> [L^2, ng]; the
    # output block is padded to 8-aligned rows when ell^2 % 8 != 0
    # (ppc=6 -> ell=10; Mosaic blocks need 8-divisible sublane dims)
    m1 = (x1[:, None, :] * y1[None, :, :]).reshape(ell * ell, s)
    esp = out_ref.shape[0]
    if esp > ell * ell:
        m1 = jnp.concatenate(
            [m1, jnp.zeros((esp - ell * ell, s), jnp.float32)], axis=0)
    out_ref[:] = _dot_f32(m1, zm, gemm)


def _deposit_kernel_occ(counts_ref, pts_ref, out_ref, *, nc, ng, ppc,
                        ell, box_size, margin, s, gemm):
    """Occupancy-aware deposit: rank-major slots, dynamic chunk trip
    count per rod (see _gather_kernel_occ). pts rows are (x, y, z, m)."""
    rod = pl.program_id(0)
    cx = rod // nc
    cy = rod % nc
    live = counts_ref[rod] * nc
    trips = (live + s - 1) // s
    out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)

    def chunk(k, carry):
        chunk0 = k * s
        pos = pts_ref[0, k, 0:3]           # [3, S]
        mass = pts_ref[0, k, 3:4][0]       # [S]
        u = pos * (ng / box_size)
        i0 = jnp.floor(u - 0.5)
        frac = (u - 0.5) - i0

        j = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) + chunk0
        zc = (j - (j // nc) * nc).astype(jnp.float32)[0]
        org = jnp.stack([
            jnp.full((s,), (cx * ppc - (margin + 1)), jnp.float32),
            jnp.full((s,), (cy * ppc - (margin + 1)), jnp.float32),
            zc * ppc - (margin + 1),
        ])
        il = i0 - org
        ok = jnp.all((il >= 0) & (il <= ell - 2), axis=0)
        w = jnp.where(ok & (mass > 0), mass, 0.0)

        ax = il[0][None, :]
        ay = il[1][None, :]
        x1 = _onehot_la(ax, frac[0][None, :], la=ell, s=s)   # [L, S]
        y1 = _onehot_la(ay, frac[1][None, :], la=ell, s=s)

        izf = i0[2] - jnp.floor(i0[2] / ng) * ng
        iz = izf[None, :]
        fz = frac[2][None, :]
        ziota = (jax.lax.broadcasted_iota(jnp.int32, (s, ng), 1)
                 .astype(jnp.float32))
        izp1 = jnp.where(iz + 1.0 == ng, 0.0, iz + 1.0)
        zm = (jnp.where(ziota == iz.T, 1.0 - fz.T, 0.0)
              + jnp.where(ziota == izp1.T, fz.T, 0.0)) * w[:, None]

        m1 = (x1[:, None, :] * y1[None, :, :]).reshape(ell * ell, s)
        esp = out_ref.shape[0]
        if esp > ell * ell:
            m1 = jnp.concatenate(
                [m1, jnp.zeros((esp - ell * ell, s), jnp.float32)],
                axis=0)
        out_ref[:] += _dot_f32(m1, zm, gemm)
        return carry

    jax.lax.fori_loop(0, trips, chunk, 0)


@functools.partial(jax.jit, static_argnames=("ncell", "ng", "margin",
                                              "box_size", "interpret",
                                              "gemm"))
def pallas_deposit_rods(bpos, bmass, *, ncell: int, ng: int, box_size,
                        margin: int = 1, interpret: bool = False,
                        gemm: str = "bf16x3", counts=None):
    """CIC mass deposit -> ([R, L, L, ng] rod blocks, dropped_count);
    z needs no ghost fold (deposited globally + periodically inside the
    kernel), so only assemble_rods' x/y fold remains.

    With `counts` (int32 [C] live counts, live-first buckets) the
    occupancy-aware variant skips dead capacity padding (see
    pallas_gather_fd4)."""
    cc3 = ncell ** 3
    soa = bpos.ndim == 3 and bpos.shape[0] == 3 and bpos.shape[1] == cc3
    cap = bpos.shape[-1] if soa else bpos.shape[1]
    ppc, ell, _, _ = rod_geometry(ng, ncell, margin)
    rr = ncell * ncell
    s_rod = ncell * cap
    esp = ((ell * ell + 7) // 8) * 8   # 8-aligned output block rows

    if counts is not None:
        s = min(s_rod, 512)
        while s_rod % s:
            s -= 128
        nchunks = s_rod // s
        rod_counts = (counts.reshape(rr, ncell).max(axis=1)
                      .astype(jnp.int32))
        if soa:
            # SoA: build the [rr, nchunks, 4, s] rank-major chunks from
            # component planes -- no [.., .., 3/4]-minor intermediates
            pts = jnp.concatenate(
                [bpos.reshape(3, rr, ncell, cap),
                 bmass.reshape(1, rr, ncell, cap)], axis=0)
            pts = (pts.transpose(1, 0, 3, 2)        # [rr, 4, cap, nc]
                   .reshape(rr, 4, nchunks, s).transpose(0, 2, 1, 3))
        else:
            pts = jnp.concatenate(
                [bpos.reshape(rr, ncell, cap, 3),
                 bmass.reshape(rr, ncell, cap, 1)], axis=-1)
            pts = (pts.transpose(0, 2, 1, 3)
                   .reshape(rr, nchunks, s, 4).transpose(0, 1, 3, 2))
        kernel = functools.partial(
            _deposit_kernel_occ, nc=ncell, ng=ng, ppc=ppc, ell=ell,
            box_size=float(box_size), margin=margin, s=s, gemm=gemm)
        blocks = pl.pallas_call(
            kernel,
            grid=(rr,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nchunks, 4, s), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((esp, ng), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rr * esp, ng),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(rod_counts, pts)
    else:
        pos_t = (bpos.reshape(3, rr * s_rod) if soa else
                 bpos.reshape(rr, s_rod, 3).transpose(2, 0, 1)
                 .reshape(3, rr * s_rod))
        mass_r = bmass.reshape(rr * s_rod)

        kernel = functools.partial(
            _deposit_kernel, nc=ncell, cap=cap, ng=ng, ppc=ppc, ell=ell,
            box_size=float(box_size), margin=margin, gemm=gemm)
        blocks = pl.pallas_call(
            kernel,
            grid=(rr,),
            in_specs=[
                pl.BlockSpec((3, s_rod), lambda i: (0, i)),
                pl.BlockSpec((s_rod,), lambda i: (i,)),
            ],
            out_specs=pl.BlockSpec((esp, ng), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rr * esp, ng),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(pos_t, mass_r)
    if esp > ell * ell:
        blocks = (blocks.reshape(rr, esp, ng)[:, :ell * ell]
                  .reshape(rr * ell * ell, ng))

    # margin-drop count (cheap elementwise, outside the kernel)
    from .bucketed_pm import _block_origins
    origins = _block_origins(ncell, ppc, margin)
    u = bpos * (ng / box_size)
    if soa:
        # [3, C, K] against origins [C, 3]: broadcast per component
        il = jnp.floor(u - 0.5) - origins.T[:, :, None]
        okd = jnp.all((il >= 0) & (il <= ell - 2), axis=0)
    else:
        il = jnp.floor(u - 0.5) - origins[:, None, :]
        okd = jnp.all((il >= 0) & (il <= ell - 2), axis=-1)
    dropped = jnp.sum((bmass > 0) & ~okd)
    return blocks.reshape(rr, ell, ell, ng), dropped


@functools.partial(jax.jit, static_argnames=("ncell", "ng", "margin"))
def assemble_rods(blocks, *, ncell: int, ng: int, margin: int = 1):
    """[R, L, L, ng] rod deposit blocks -> [ng, ng, ng] global grid:
    fold the x/y ghost layers into the +-1 neighbor rods (z is already
    global and periodic)."""
    from .bucketed_pm import _fold_axis
    c = ncell
    ppc, ell, _, _ = rod_geometry(ng, c, margin)
    ghost = margin + 1
    a = blocks.reshape(c, c, ell, ell, ng)
    a = _fold_axis(a, 1, 3, c=c, ppc=ppc, ghost=ghost)   # y
    a = _fold_axis(a, 0, 2, c=c, ppc=ppc, ghost=ghost)   # x
    return a.transpose(0, 2, 1, 3, 4).reshape(ng, ng, ng)
