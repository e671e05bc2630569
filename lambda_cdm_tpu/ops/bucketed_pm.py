"""Scatter-free PM deposit & gather on cell-bucketed particles (MXU path).

Why: XLA's scatter-add on TPU serializes -- the plain CIC deposit of 1M
particles into a 256^3 grid costs ~110 ms on v5e, and XLA gather is not
much better. This module removes BOTH from the PM hot path (the deposit
bottleneck called out in SURVEY.md section 7 "Hard parts"):

  * particles live in the TreePM cell-bucket layout [C, K, ...] (zero-mass
    padding), with the PM mesh an integer multiple of the cell grid;
  * per-axis CIC weights become one-hot factor matrices X/Y/Z of shape
    [C, K, L] over each cell's LOCAL (ppc + 2*margin + 2)^3 mesh block, so
    the deposit is two batched matmuls per cell (an MXU histogram), and the
    gather is the transpose contraction;
  * local blocks are assembled into / extracted from the global mesh with
    27 dense pad-roll-add segment moves (no scatter);
  * `margin` PM cells of slack let particles drift off their home cell
    between (amortized) re-bucketings; out-of-range particles are dropped
    from the deposit and COUNTED, never silently lost.

This is the TPU-idiomatic answer to the reference's atomic-add CIC kernel
(power_spectrum.cu:86-134) -- matmul histograms instead of atomics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def block_geometry(ng: int, ncell: int, margin: int = 1):
    """(ppc, L): PM cells per bucket cell and local block edge length."""
    if ng % ncell:
        raise ValueError(f"PM grid {ng} must be a multiple of ncell {ncell}")
    ppc = ng // ncell
    return ppc, ppc + 2 * margin + 2


def _cic_factors(bpos, bmass, *, ncell: int, ng: int, box_size,
                 margin: int):
    """Per-axis one-hot CIC factor matrices.

    Returns (X, Y, Zm [C,K,L], drop_count) where Zm carries the mass and
    the validity mask (drift beyond margin -> weight 0, counted).
    """
    c = ncell
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, c, margin)

    # block origin in global PM coords, per cell and axis
    cell_idx = jnp.arange(c)
    # cell id decomposition matches bucket_particles: ((cx*c)+cy)*c+cz
    cid = jnp.arange(c ** 3)
    cx = cid // (c * c)
    cy = (cid // c) % c
    cz = cid % c
    origin = jnp.stack([cx, cy, cz], axis=-1) * ppc - (margin + 1)  # [C,3]

    u = bpos / box_size * ng                  # global PM coords [C,K,3]
    i0 = jnp.floor(u - 0.5).astype(jnp.int32)
    frac = (u - 0.5) - i0
    il = i0 - origin[:, None, :]              # local lower corner [C,K,3]

    ok = jnp.all((il >= 0) & (il <= ell - 2), axis=-1)       # [C,K]
    live = bmass > 0
    dropped = jnp.sum(live & ~ok)
    ilc = jnp.clip(il, 0, ell - 2)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ell), 2)

    def onehot(axis):
        i_ax = ilc[..., axis][..., None]      # [C,K,1]
        f_ax = frac[..., axis][..., None]
        return (jnp.where(iota == i_ax, 1.0 - f_ax, 0.0)
                + jnp.where(iota == i_ax + 1, f_ax, 0.0))

    x = onehot(0)
    y = onehot(1)
    zm = onehot(2) * jnp.where(live & ok, bmass, 0.0)[..., None]
    return x, y, zm, dropped


def _assemble(local, *, ncell: int, ng: int, margin: int):
    """[C, L, L, L] local blocks -> [ng, ng, ng] global grid via 27 dense
    segment moves (overlapping ghost planes roll into neighbor blocks)."""
    c = ncell
    ppc, ell = block_geometry(ng, c, margin)
    ghost = margin + 1
    loc = local.reshape(c, c, c, ell, ell, ell)
    out = jnp.zeros((c, c, c, ppc, ppc, ppc), local.dtype)

    # segment s: local l range and intra-block placement for g = l - ghost
    segs = {
        -1: (slice(0, ghost), slice(ppc - ghost, ppc)),
        0: (slice(ghost, ghost + ppc), slice(0, ppc)),
        1: (slice(ghost + ppc, ell), slice(0, ell - ghost - ppc)),
    }
    for sx, (lx, gx) in segs.items():
        for sy, (ly, gy) in segs.items():
            for sz, (lz, gz) in segs.items():
                piece = loc[:, :, :, lx, ly, lz]
                pad = jnp.zeros_like(out)
                pad = pad.at[:, :, :, gx, gy, gz].set(piece)
                if sx or sy or sz:
                    # block c's segment s lands in block c+s: out[c+s] +=
                    # piece[c]  <=>  out += roll(piece-padded, +s)
                    pad = jnp.roll(pad, (sx, sy, sz), axis=(0, 1, 2))
                out = out + pad
    # [c,c,c,ppc,ppc,ppc] -> [ng,ng,ng]
    return out.transpose(0, 3, 1, 4, 2, 5).reshape(ng, ng, ng)


def _extract(grid, *, ncell: int, ng: int, margin: int):
    """[ng,ng,ng] -> [C, L, L, L] local blocks (reverse of _assemble)."""
    c = ncell
    ppc, ell = block_geometry(ng, c, margin)
    ghost = margin + 1
    blocks6 = grid.reshape(c, ppc, c, ppc, c, ppc).transpose(0, 2, 4, 1, 3, 5)
    loc = jnp.zeros((c, c, c, ell, ell, ell), grid.dtype)
    segs = {
        -1: (slice(0, ghost), slice(ppc - ghost, ppc)),
        0: (slice(ghost, ghost + ppc), slice(0, ppc)),
        1: (slice(ghost + ppc, ell), slice(0, ell - ghost - ppc)),
    }
    for sx, (lx, gx) in segs.items():
        for sy, (ly, gy) in segs.items():
            for sz, (lz, gz) in segs.items():
                src = blocks6
                if sx or sy or sz:
                    src = jnp.roll(src, (-sx, -sy, -sz), axis=(0, 1, 2))
                loc = loc.at[:, :, :, lx, ly, lz].set(
                    src[:, :, :, gx, gy, gz])
    return loc.reshape(c ** 3, ell, ell, ell)


def _cell_chunks(cc: int, target: int = 2048) -> int:
    """Largest divisor of cc not exceeding target (bounds the [chunk,K,L^2]
    GEMM intermediate to ~100 MB at production scale)."""
    chunk = min(cc, target)
    while cc % chunk:
        chunk -= 1
    return chunk


@partial(jax.jit, static_argnames=("ncell", "ng", "margin"))
def deposit_from_buckets(bpos, bmass, *, ncell: int, ng: int, box_size,
                         margin: int = 1):
    """CIC mass deposit [ng,ng,ng] from bucketed particles -- two batched
    matmuls + dense assembly; returns (grid, dropped_count)."""
    cc = ncell ** 3
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    x, y, zm, dropped = _cic_factors(
        bpos, bmass, ncell=ncell, ng=ng, box_size=box_size, margin=margin)

    chunk = _cell_chunks(cc)

    def chunk_local(args):
        xc, yc, zc = args
        # M1[c, k, a*L+b] = X[c,k,a] Y[c,k,b]   (VPU outer product)
        m1 = (xc[:, :, :, None] * yc[:, :, None, :]).reshape(
            chunk, k, ell * ell)
        # local[c, ab, z] = sum_k M1[c,k,ab] Zm[c,k,z]  (MXU batched GEMM)
        return jnp.einsum("cka,ckz->caz", m1, zc,
                          preferred_element_type=jnp.float32)

    xs = (x.reshape(-1, chunk, k, ell), y.reshape(-1, chunk, k, ell),
          zm.reshape(-1, chunk, k, ell))
    local = jax.lax.map(chunk_local, xs).reshape(cc, ell, ell, ell)
    grid = _assemble(local, ncell=ncell, ng=ng, margin=margin)
    return grid, dropped


@partial(jax.jit, static_argnames=("ncell", "ng", "margin"))
def gather_to_buckets(grid, bpos, bmass, *, ncell: int, ng: int, box_size,
                      margin: int = 1):
    """Trilinear interpolation of `grid` at every bucketed particle ->
    [C, K] values (the cic_gather adjoint, scatter/gather-free)."""
    cc = ncell ** 3
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    # unit-mass factors: fold validity into Z by passing mass=1 where live
    ones = jnp.where(bmass > 0, 1.0, 0.0)
    x, y, z1, _ = _cic_factors(
        bpos, ones, ncell=ncell, ng=ng, box_size=box_size, margin=margin)

    local = _extract(grid, ncell=ncell, ng=ng, margin=margin)
    chunk = _cell_chunks(cc)

    def chunk_vals(args):
        xc, yc, zc, loc = args
        # T1[c,k,(b,z)] = sum_a X[c,k,a] local[c,a,(b,z)] (MXU GEMM)
        t1 = jnp.einsum("cka,cabz->ckbz", xc, loc,
                        preferred_element_type=jnp.float32)
        # contract b then z on the VPU
        t2 = jnp.sum(t1 * yc[:, :, :, None], axis=2)   # [chunk,K,L]
        return jnp.sum(t2 * zc, axis=2)                # [chunk,K]

    xs = (x.reshape(-1, chunk, k, ell), y.reshape(-1, chunk, k, ell),
          z1.reshape(-1, chunk, k, ell),
          local.reshape(-1, chunk, ell, ell, ell))
    return jax.lax.map(chunk_vals, xs).reshape(cc, k)


# ---------------------------------------------------------------------------
# PM accelerations on buckets
# ---------------------------------------------------------------------------

def _greens(ng: int, box_size, split_scale, deconvolve_cic=True):
    from ..forces.pm import poisson_greens_function
    return poisson_greens_function(ng, box_size, split_scale=split_scale,
                                   deconvolve_cic=deconvolve_cic)


@partial(jax.jit, static_argnames=("ncell", "ng", "margin", "split_scale",
                                   "gradient"))
def pm_accelerations_bucketed(bpos, bmass, *, ncell: int, ng: int,
                              box_size, g_const=1.0, split_scale=0.0,
                              margin: int = 1, gradient: str = "spectral"):
    """Long-range PM accelerations for bucketed particles -> [C, K, 3].

    gradient="fd4": solve for the potential with ONE inverse FFT and take
    4th-order central differences (dense rolls) -- halves the FFT count vs
    the spectral i*k gradient (XLA's TPU FFT is the PM floor: ~34 ms per
    256^3 transform on v5e). Accurate to <1% on the Gaussian-split
    long-range force (error ~ (k h)^4/30 under the exp(-k^2 rs^2) damping).
    """
    from ..physics.initial_conditions import fourier_grid

    cell_volume = (box_size / ng) ** 3
    grid, dropped = deposit_from_buckets(
        bpos, bmass, ncell=ncell, ng=ng, box_size=box_size, margin=margin)
    rho_k = jnp.fft.rfftn(grid / cell_volume)
    green = _greens(ng, box_size, split_scale)
    phi_k = green * rho_k

    acc = []
    if gradient == "spectral":
        kx, ky, kz, _ = fourier_grid(ng, box_size)
        for kvec in (kx, ky, kz):
            g = jnp.fft.irfftn(-1j * kvec * phi_k, s=(ng, ng, ng))
            acc.append(gather_to_buckets(
                g, bpos, bmass, ncell=ncell, ng=ng, box_size=box_size,
                margin=margin))
    elif gradient == "fd4":
        phi = jnp.fft.irfftn(phi_k, s=(ng, ng, ng))
        h = box_size / ng
        for axis in range(3):
            d = (8.0 * (jnp.roll(phi, -1, axis) - jnp.roll(phi, 1, axis))
                 - (jnp.roll(phi, -2, axis) - jnp.roll(phi, 2, axis))) \
                / (12.0 * h)
            acc.append(gather_to_buckets(
                -d, bpos, bmass, ncell=ncell, ng=ng, box_size=box_size,
                margin=margin))
    else:
        raise ValueError(f"unknown gradient {gradient!r}")
    return g_const * jnp.stack(acc, axis=-1), dropped
