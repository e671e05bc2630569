"""Pallas TPU kernels: fused CIC deposit / gather on cell-bucketed particles.

The jnp deposit/gather (ops/bucketed_pm.py) is algorithmically right for
TPU (one-hot factor matrices -> batched GEMMs, no scatter) but XLA
materializes the [B, K, L^2] outer-product intermediates in HBM and
shuffles operands for each tiny GEMM — measured 46 ms (deposit) +
~100 ms (gather) at 1M/192^3 on v5e, ~30x off the arithmetic cost.
These kernels build the factors, outer products and contractions
entirely in VMEM per cell chunk:

  deposit  (per cell): X[L,K] one-hots -> m1[(a,b)=L^2, K] outer ->
            MXU GEMM m1 @ Zm[K, L] -> local block [L^2, L]
  gather   (per cell, F fields): T1[(b,z), K] = locT[(b,z), a] @ X[a, K]
            (MXU) -> VPU segment-reduce with Y over b -> reduce with Z
            over z -> values [F, K]

Layouts keep K = capacity on the 128-lane axis everywhere; the L-sized
axes ride sublanes (padded to 8/16, cheap). Out-of-margin particles get
zero weight here and are COUNTED by the caller (the jnp `_cic_factors`
drop logic, reproduced bit-compatibly).

Reference parity: the atomic-add CIC kernel (power_spectrum.cu:86-134)
and TRT fused plugins (SURVEY.md section 2.5) — rebuilt as MXU
histograms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST


def _factors_batched(pos, org, *, ng, box_size, ell, b, k):
    """One-hot CIC factors for a [3, B, K] position block (B cells).

    Returns (x [B,L,K], y [B,L,K], z_kl [B,K,L], ok [B,1,K]): x/y
    oriented with L on sublanes for the outer product, z oriented [K, L]
    as the GEMM right-hand side. `ok` masks particles inside the margin
    window."""
    u = pos * (ng / box_size)                    # [3, B, K]
    i0 = jnp.floor(u - 0.5)
    frac = (u - 0.5) - i0
    il = i0 - org                                # [3, B, K] float
    ok = jnp.all((il >= 0) & (il <= ell - 2), axis=0)[:, None, :]
    ilc = jnp.clip(il, 0.0, float(ell - 2))

    iota = jax.lax.broadcasted_iota(jnp.int32, (b, ell, k), 1) \
        .astype(jnp.float32)

    def onehot(axis):
        i_ax = ilc[axis][:, None, :]             # [B, 1, K]
        f_ax = frac[axis][:, None, :]
        return (jnp.where(iota == i_ax, 1.0 - f_ax, 0.0)
                + jnp.where(iota == i_ax + 1.0, f_ax, 0.0))

    iota_kl = jax.lax.broadcasted_iota(jnp.int32, (b, k, ell), 2) \
        .astype(jnp.float32)
    i_z = ilc[2][:, :, None]                     # [B, K, 1]
    f_z = frac[2][:, :, None]
    z_kl = (jnp.where(iota_kl == i_z, 1.0 - f_z, 0.0)
            + jnp.where(iota_kl == i_z + 1.0, f_z, 0.0))
    return onehot(0), onehot(1), z_kl, ok


def _deposit_kernel(pos_ref, mass_ref, org_ref, out_ref, *, ng, box_size,
                    ell, cap, cells):
    """One grid instance deposits `cells` cells, fully batched:
    [3,B,K]+[B,K] -> [B, L^2, L] local blocks (one batched MXU GEMM)."""
    pos = pos_ref[:]                             # [3, B, K]
    mass = mass_ref[:]                           # [B, K]
    org = org_ref[:].transpose(1, 0)[:, :, None]  # [3, B, 1]
    x, y, z_kl, ok = _factors_batched(
        pos, org, ng=ng, box_size=box_size, ell=ell, b=cells, k=cap)
    w = jnp.where(ok[:, 0, :] & (mass > 0), mass, 0.0)     # [B, K]
    zm = z_kl * w[:, :, None]                    # [B, K, L]
    # outer product -> [B, L^2, K]
    m1 = (x[:, :, None, :] * y[:, None, :, :]).reshape(
        cells, ell * ell, cap)
    out_ref[:] = jax.lax.dot_general(
        m1, zm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGHEST)


def _gather_kernel(loc_ref, pos_ref, org_ref, out_ref, *, ng, box_size,
                   ell, cap, cells, nf):
    """One grid instance gathers `cells` cells x `nf` fields, fully
    batched: locT [B, F*L^2(b,z), L(a)] + [3,B,K] -> [B, F, K] via one
    batched MXU GEMM + VPU segment reductions."""
    pos = pos_ref[:]
    org = org_ref[:].transpose(1, 0)[:, :, None]
    x, y, z_kl, ok = _factors_batched(
        pos, org, ng=ng, box_size=box_size, ell=ell, b=cells, k=cap)
    okf = jnp.where(ok, 1.0, 0.0)                # [B, 1, K]
    zt = z_kl.transpose(0, 2, 1) * okf           # [B, L, K] masked
    loc_t = loc_ref[:]                           # [B, F*L^2, L]
    # T1[B, F*L^2(b,z), K] = locT @ X   (batched MXU, contraction L)
    t1 = jax.lax.dot_general(
        loc_t, x, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=HIGHEST)
    t1 = t1.reshape(cells, nf, ell, ell, cap) * y[:, None, :, None, :]
    t2 = jnp.sum(t1, axis=2)                     # [B, F, L(z), K]
    out_ref[:] = jnp.sum(t2 * zt[:, None, :, :], axis=2)   # [B, F, K]


def _chunk(cc: int, bytes_per_cell: int, budget: int = 6_000_000) -> int:
    """Cells per grid instance, bounded by a VMEM budget for the largest
    per-cell tensor (the [L^2, K] outer product / [F L^2, K] T1)."""
    c = min(cc, max(1, budget // max(bytes_per_cell, 1)))
    while cc % c:
        c -= 1
    return c


@functools.partial(jax.jit, static_argnames=("ncell", "ng", "margin",
                                              "box_size", "interpret"))
def pallas_deposit_blocks(bpos, bmass, *, ncell: int, ng: int, box_size,
                          margin: int = 1, interpret: bool = False):
    """Local CIC deposit blocks [C, L, L, L] from bucketed particles
    (the Pallas twin of the per-chunk body in deposit_from_buckets;
    assembly into the global grid stays in XLA). Returns (blocks,
    dropped_count)."""
    from .bucketed_pm import _block_origins, block_geometry
    cc = ncell ** 3
    cap = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    origins = _block_origins(ncell, ppc, margin).astype(jnp.float32)

    pos_t = bpos.transpose(2, 0, 1)              # [3, C, K]
    cells = _chunk(cc, ell * ell * cap * 4)
    grid = cc // cells

    kernel = functools.partial(
        _deposit_kernel, ng=ng, box_size=float(box_size), ell=ell,
        cap=cap, cells=cells)
    blocks = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, cells, cap), lambda i: (0, i, 0)),
            pl.BlockSpec((cells, cap), lambda i: (i, 0)),
            pl.BlockSpec((cells, 3), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((cells, ell * ell, ell),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((cc, ell * ell, ell), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pos_t, bmass, origins)

    # margin-drop count (outside the kernel: cheap elementwise)
    u = bpos * (ng / box_size)
    il = jnp.floor(u - 0.5) - origins[:, None, :]
    ok = jnp.all((il >= 0) & (il <= ell - 2), axis=-1)
    dropped = jnp.sum((bmass > 0) & ~ok)
    return blocks.reshape(cc, ell, ell, ell), dropped


@functools.partial(jax.jit, static_argnames=("ncell", "ng", "margin",
                                              "box_size", "interpret"))
def pallas_gather_fields(fields_blocks, bpos, *, ncell: int, ng: int,
                         box_size, margin: int = 1,
                         interpret: bool = False):
    """Trilinear interpolation of F extracted field blocks at every
    bucketed particle -> [C, K, F] (Pallas twin of gather_to_buckets'
    chunk body; block extraction stays in XLA).

    fields_blocks: [C, F, L, L, L] from bucketed_pm._extract."""
    from .bucketed_pm import _block_origins, block_geometry
    cc = ncell ** 3
    cap = bpos.shape[1]
    nf = fields_blocks.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    origins = _block_origins(ncell, ppc, margin).astype(jnp.float32)

    # locT rows are (b, z) pairs, cols a: transpose a to the minor axis
    loc_t = fields_blocks.transpose(0, 1, 3, 4, 2) \
        .reshape(cc, nf, ell * ell, ell)
    pos_t = bpos.transpose(2, 0, 1)
    cells = _chunk(cc, 16)
    grid = cc // cells

    loc_t = loc_t.reshape(cc, nf * ell * ell, ell)
    kernel = functools.partial(
        _gather_kernel, ng=ng, box_size=float(box_size), ell=ell,
        cap=cap, cells=cells, nf=nf)
    vals = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((cells, nf * ell * ell, ell),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec((3, cells, cap), lambda i: (0, i, 0)),
            pl.BlockSpec((cells, 3), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((cells, nf, cap), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((cc, nf, cap), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(loc_t, pos_t, origins)
    return vals.transpose(0, 2, 1)               # [C, K, F]
