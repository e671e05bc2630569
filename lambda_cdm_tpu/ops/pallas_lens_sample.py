"""Pallas TPU kernel: fused bilinear field sampling for the ray tracer.

`raytracing.lensing.bilinear_sample_matmul` expresses bilinear
interpolation as two one-hot contractions so the MXU does the work
(XLA gathers serialize at ~46 ns/element on TPU), but XLA materializes
the intermediate t[F, R, ng] to HBM between the GEMM and the Wy
reduction — ~400 MB of traffic per lens plane at the bench geometry
(65k rays, ng=256, F=3), which dominates the tracer's step time.

This kernel runs the same math per ray tile entirely in VMEM:

    Wx[RT, ng] = one-hot rows (1-fx at ix, fx at ix+1)   (VPU build)
    t = Wx @ fields_cat                                  (MXU, bf16x3)
    out[tile, f] = sum_j t[:, f*ng:(f+1)*ng] * Wy        (VPU reduce)

so the only HBM traffic is the rays in and samples out, and every
field channel rides ONE GEMM (channels concatenated along lanes).
Rays stay on sublanes end to end: xy arrives [RT, 2] and samples leave
[RT, F], so the kernel needs no lane<->sublane relayouts (an earlier
[2, RT] layout spent more time transposing than sampling).

The GEMM runs as a manual bf16x3 split (hi/lo decomposition, three
DEFAULT-precision passes): Mosaic's f32 dot (HIGHEST) costs 6 MXU
passes and its DEFAULT single bf16 pass loses ~1e-2 absolute on O(1)
fields; bf16x3 keeps f32-faithful samples at half the HIGHEST cost.

Replaces the role of the reference's texture-unit interpolation in its
planned raytracer (the reference shipped no raytracing code at all;
capability defined by README.md:32 and BASELINE.json's lensing metric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RT = 2048   # rays per grid instance (sublane dim of the one-hot tiles);
#              small tiles pay per-instance grid overhead (~1 ms/plane
#              at RT=512), big ones trade VMEM: t is [RT, F*ng] f32


def _dot_bf16x3(a, b):
    """f32-faithful a @ b via three bf16 MXU passes. BOTH splits happen
    in-kernel: XLA (outside Mosaic) folds `x - f32(bf16(x))` to zero
    under its excess-precision simplification, silently dropping the
    lo terms — splitting under Mosaic is the only safe place (same
    lesson as ops/pallas_pm_rods._dot_f32)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.dot(a_hi, b_hi, **kw)
            + (jax.lax.dot(a_hi, b_lo, **kw)
               + jax.lax.dot(a_lo, b_hi, **kw)))


def _sample_t(wx, fields, ng, n_fields, fast_channels):
    """wx @ fields with the LAST `fast_channels` field channels on one
    bf16 pass instead of the f32-faithful three (the Jacobian Hessian
    channels are ~1e-2 corrections to the distortion matrix: bf16's
    ~2e-3 relative sampling error lands ~2e-5 ABSOLUTE on A, far below
    the bilinear interpolation error; the deflection/overdensity
    channels that set ray paths and kappa keep all three passes).
    Cuts the Jacobian tracer's MXU work from 6x3 to 3x3+3x1
    pass-channels (VERDICT r3 item 8)."""
    fc = min(fast_channels, n_fields)
    if fc <= 0:
        return _dot_bf16x3(wx, fields)
    split = (n_fields - fc) * ng
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    t_hi = _dot_bf16x3(wx, fields[:, :split])
    t_fast = jax.lax.dot(wx.astype(jnp.bfloat16),
                         fields[:, split:].astype(jnp.bfloat16), **kw)
    return jnp.concatenate([t_hi, t_fast], axis=1)


def _lens_sample_kernel(xy_ref, fields_ref, out_ref, *, ng, n_fields,
                        fast_channels):
    """xy_ref [RT, 2] (positions pre-scaled to grid units = xy/extent*ng),
    fields_ref [ng, F*ng] f32 (field stack, channels along lanes),
    out_ref [RT, F]."""
    rt = xy_ref.shape[0]
    u = xy_ref[...] - 0.5                       # [RT, 2]
    i0 = jnp.floor(u)
    fr = u - i0                                 # in [0, 1)
    i0i = i0.astype(jnp.int32)

    ia_x = jnp.mod(i0i[:, 0:1], ng)             # [RT, 1] — no relayouts:
    ia_y = jnp.mod(i0i[:, 1:2], ng)             # rays ride sublanes in
    ib_x = jnp.mod(i0i[:, 0:1] + 1, ng)         # the input layout already
    ib_y = jnp.mod(i0i[:, 1:2] + 1, ng)
    fx = fr[:, 0:1]
    fy = fr[:, 1:2]

    iota = jax.lax.broadcasted_iota(jnp.int32, (rt, ng), 1)
    wx = (jnp.where(iota == ia_x, 1.0 - fx, 0.0)
          + jnp.where(iota == ib_x, fx, 0.0))   # [RT, ng]
    wy = (jnp.where(iota == ia_y, 1.0 - fy, 0.0)
          + jnp.where(iota == ib_y, fy, 0.0))

    t = _sample_t(wx, fields_ref[...], ng, n_fields,
                  fast_channels)                      # [RT, F*ng]
    for f in range(n_fields):
        out_ref[:, f:f + 1] = jnp.sum(
            t[:, f * ng:(f + 1) * ng] * wy, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "fast_channels"))
def pallas_bilinear_sample(fields, xy, extent, *,
                           fast_channels: int = 0,
                           interpret: bool = False):
    """Periodic bilinear sampling of a [F, ng, ng] field stack at
    xy [R, 2] points in [0, extent)^2 -> [F, R].

    Drop-in for lensing.bilinear_sample_matmul's contraction (same
    one-hot math, fused in VMEM). ng must be a multiple of 128 (lane
    dim of the one-hot/GEMM tiles); R is padded to the ray tile
    internally. `extent` may be a traced scalar.
    """
    n_fields, ng = fields.shape[0], fields.shape[-1]
    if ng % 128:
        raise ValueError(f"pallas_bilinear_sample needs ng % 128 == 0, "
                         f"got {ng}")
    r = xy.shape[0]
    r_pad = ((r + _RT - 1) // _RT) * _RT
    # pre-scale to grid units in XLA-land (extent may be traced)
    xy_grid = (xy / extent * ng).astype(jnp.float32)
    xyp = jnp.zeros((r_pad, 2), jnp.float32)
    xyp = jax.lax.dynamic_update_slice(xyp, xy_grid, (0, 0))

    # [F, ng, ng] -> [ng, F*ng]: channels side-by-side on lanes
    fcat = jnp.concatenate(
        [fields[f].astype(jnp.float32) for f in range(n_fields)], axis=1)

    kernel = functools.partial(
        _lens_sample_kernel, ng=ng, n_fields=n_fields,
        fast_channels=fast_channels)
    out = pl.pallas_call(
        kernel,
        grid=(r_pad // _RT,),
        in_specs=[
            pl.BlockSpec((_RT, 2), lambda i: (i, 0)),
            pl.BlockSpec((ng, n_fields * ng), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_RT, n_fields), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_fields), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xyp, fcat)
    return out[:r].T


# ---------------------------------------------------------------------------
# x-windowed variant: grid-coherent ray tiles
# ---------------------------------------------------------------------------

def _lens_sample_kernel_win(xy_ref, win_ref, out_ref, *, ng, n_fields, w,
                            fast_channels):
    """Same math as _lens_sample_kernel, but the x (GEMM contraction)
    axis is a per-tile window: xy_ref[:, 0] arrives RELATIVE to the
    tile's window origin (in [0, w-2]); win_ref [1, w, F*ng] holds the
    field rows of this tile's window. The GEMM K dim shrinks from ng to
    w (one 128-quantized MXU pass instead of ng/128)."""
    rt = xy_ref.shape[0]
    u = xy_ref[...] - 0.5
    i0 = jnp.floor(u)
    fr = u - i0
    i0i = i0.astype(jnp.int32)

    ia_x = i0i[:, 0:1]                          # window coords: no mod
    ia_y = jnp.mod(i0i[:, 1:2], ng)
    ib_y = jnp.mod(i0i[:, 1:2] + 1, ng)
    fx = fr[:, 0:1]
    fy = fr[:, 1:2]

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1)
    wx = (jnp.where(iota_w == ia_x, 1.0 - fx, 0.0)
          + jnp.where(iota_w == ia_x + 1, fx, 0.0))   # [RT, w]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rt, ng), 1)
    wy = (jnp.where(iota == ia_y, 1.0 - fy, 0.0)
          + jnp.where(iota == ib_y, fy, 0.0))

    t = _sample_t(wx, win_ref[0], ng, n_fields,
                  fast_channels)                      # [RT, F*ng]
    for f in range(n_fields):
        out_ref[:, f:f + 1] = jnp.sum(
            t[:, f * ng:(f + 1) * ng] * wy, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("window", "interpret",
                                             "fast_channels"))
def pallas_bilinear_sample_xwin(fields, xy, extent, *, window: int,
                                fast_channels: int = 0,
                                interpret: bool = False):
    """Periodic bilinear sampling of a [F, ng, ng] field stack at
    xy [R, 2] points -> [F, R], with a per-ray-tile x WINDOW.

    xy[:, 0] must be UNWRAPPED (periodic equivalence assumed, any
    magnitude/sign): consecutive rays in grid order keep a small x
    span per tile, which mod-wrapping would split across the box edge.
    The caller guarantees every _RT-ray tile's x span (in grid cells)
    is <= window - 10 (see raytracing.lensing.auto_sample_window for
    the provable bound); the full-field sampler is the fallback when
    no such bound holds. Cost: the full kernel's GEMM contracts ng
    rows per tile (cost ~ F*ng^2 per ray); here it contracts `window`
    rows (~ F*ng*128-quantized), so 512^2 fields stop paying 4x over
    256^2 on the MXU side.
    """
    n_fields, ng = fields.shape[0], fields.shape[-1]
    if ng % 128:
        raise ValueError(f"pallas_bilinear_sample_xwin needs ng % 128 "
                         f"== 0, got {ng}")
    w = ((int(window) + 7) // 8) * 8
    if w >= ng:
        raise ValueError(f"window {window} >= ng {ng}: use "
                         f"pallas_bilinear_sample")
    r = xy.shape[0]
    r_pad = ((r + _RT - 1) // _RT) * _RT
    n_tiles = r_pad // _RT
    xg = (xy[:, 0] / extent * ng).astype(jnp.float32)     # unwrapped
    yg = jnp.mod(xy[:, 1] / extent * ng, ng).astype(jnp.float32)
    # edge-pad: zero-padding would drag the LAST tile's window origin
    # to row 0 and push its real rays past the window
    xg = jnp.pad(xg, (0, r_pad - r), mode="edge") if r_pad > r else xg
    yg = jnp.pad(yg, (0, r_pad - r)) if r_pad > r else yg

    # per-tile window origin = the tile's minimum CIC base cell, so the
    # in-kernel i0_rel = floor(xrel - 0.5) = i0 - x0 starts at row 0
    xt = xg.reshape(n_tiles, _RT)
    x0 = jnp.floor(jnp.min(xt, axis=1) - 0.5).astype(jnp.int32)   # [T]
    phase = jnp.mod(x0, ng)                                # in [0, ng)
    xrel = (xt - x0[:, None].astype(jnp.float32)).reshape(r_pad)
    xyp = jnp.stack([xrel, yg], axis=1)

    # [F, ng, ng] -> [ng + w, F*ng] with wrap rows so every window
    # [phase, phase + w) reads periodic content
    fcat = jnp.concatenate(
        [fields[f].astype(jnp.float32) for f in range(n_fields)], axis=1)
    fcat_pad = jnp.concatenate([fcat, fcat[:w]], axis=0)
    windows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(
            fcat_pad, (s, 0), (w, n_fields * ng)))(phase)  # [T, w, F*ng]

    kernel = functools.partial(
        _lens_sample_kernel_win, ng=ng, n_fields=n_fields, w=w,
        fast_channels=fast_channels)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_RT, 2), lambda i: (i, 0)),
            pl.BlockSpec((1, w, n_fields * ng), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((_RT, n_fields), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, n_fields), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xyp, windows)
    return out[:r].T
