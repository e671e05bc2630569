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


def _block_origins(ncell: int, ppc: int, margin: int):
    """Block origin in global PM coords per cell -> [C, 3] int32.
    Cell id decomposition matches bucket_particles: ((cx*c)+cy)*c+cz."""
    c = ncell
    cid = jnp.arange(c ** 3)
    cx = cid // (c * c)
    cy = (cid // c) % c
    cz = cid % c
    return (jnp.stack([cx, cy, cz], axis=-1) * ppc
            - (margin + 1)).astype(jnp.int32)


def _cic_factors(bpos, bmass, origin, *, ng: int, box_size, ell: int,
                 derivatives: bool = False):
    """Per-axis one-hot CIC factor matrices for a batch of cells.

    bpos [B, K, 3], bmass [B, K], origin [B, 3]. Returns
    (X, Y, Zm [B,K,L], drop_count); Zm carries the mass and the validity
    mask (drift beyond margin -> weight 0, counted). With
    `derivatives=True` additionally returns (dX, dY, dZ): the spatial
    derivatives of the per-axis weights (+-ng/box at the two corners),
    for force-from-potential interpolation gradients."""
    u = bpos / box_size * ng                  # global PM coords [B,K,3]
    i0 = jnp.floor(u - 0.5).astype(jnp.int32)
    frac = (u - 0.5) - i0
    il = i0 - origin[:, None, :]              # local lower corner [B,K,3]

    ok = jnp.all((il >= 0) & (il <= ell - 2), axis=-1)       # [B,K]
    live = bmass > 0
    dropped = jnp.sum(live & ~ok)
    ilc = jnp.clip(il, 0, ell - 2)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ell), 2)

    def onehot(axis):
        i_ax = ilc[..., axis][..., None]      # [B,K,1]
        f_ax = frac[..., axis][..., None]
        return (jnp.where(iota == i_ax, 1.0 - f_ax, 0.0)
                + jnp.where(iota == i_ax + 1, f_ax, 0.0))

    x = onehot(0)
    y = onehot(1)
    zm = onehot(2) * jnp.where(live & ok, bmass, 0.0)[..., None]
    if not derivatives:
        return x, y, zm, dropped

    scale = ng / box_size                    # d(weight)/d(position)

    def donehot(axis):
        i_ax = ilc[..., axis][..., None]
        return (jnp.where(iota == i_ax, -scale, 0.0)
                + jnp.where(iota == i_ax + 1, scale, 0.0))

    return x, y, zm, dropped, donehot(0), donehot(1), donehot(2)


def _fold_axis(arr, block_axis, local_axis, *, c, ppc, ghost):
    """Resolve one axis's block overlap: local extent L -> ppc by adding
    the ghost segments into the +-1 neighbor blocks along `block_axis`."""
    ell = arr.shape[local_axis]
    idx_main = [slice(None)] * arr.ndim
    idx_main[local_axis] = slice(ghost, ghost + ppc)
    out = arr[tuple(idx_main)]

    idx_lo = [slice(None)] * arr.ndim
    idx_lo[local_axis] = slice(0, ghost)
    lo = arr[tuple(idx_lo)]                      # lands in block-1, tail
    pad_lo = jnp.zeros_like(out)
    place_lo = [slice(None)] * arr.ndim
    place_lo[local_axis] = slice(ppc - ghost, ppc)
    pad_lo = pad_lo.at[tuple(place_lo)].set(lo)
    out = out + jnp.roll(pad_lo, -1, axis=block_axis)

    idx_hi = [slice(None)] * arr.ndim
    idx_hi[local_axis] = slice(ghost + ppc, ell)
    hi = arr[tuple(idx_hi)]                      # lands in block+1, head
    pad_hi = jnp.zeros_like(out)
    place_hi = [slice(None)] * arr.ndim
    place_hi[local_axis] = slice(0, ell - ghost - ppc)
    pad_hi = pad_hi.at[tuple(place_hi)].set(hi)
    out = out + jnp.roll(pad_hi, 1, axis=block_axis)
    return out


def _unfold_axis(arr, block_axis, local_axis, *, c, ppc, ghost, ell):
    """Inverse of _fold_axis: ppc -> L by gathering neighbor ghosts.

    Pure concatenation of rolled slices (a single fusible XLA op): the
    original .at[].set chain materialized three full-size intermediates
    per axis per field and cost ~190 ms for a 3-field 192^3 extract on
    v5e; this form is bandwidth-bound (~10x faster)."""
    take_lo = [slice(None)] * arr.ndim
    take_lo[local_axis] = slice(ppc - ghost, ppc)
    lo = jnp.roll(arr, 1, axis=block_axis)[tuple(take_lo)]

    take_hi = [slice(None)] * arr.ndim
    take_hi[local_axis] = slice(0, ell - ghost - ppc)
    hi = jnp.roll(arr, -1, axis=block_axis)[tuple(take_hi)]
    return jnp.concatenate([lo, arr, hi], axis=local_axis)


def _assemble(local, *, ncell: int, ng: int, margin: int):
    """[C, L, L, L] local blocks -> [ng, ng, ng] global grid.

    Axis-separable overlap resolution: fold z, then y, then x (9 dense
    segment moves of shrinking arrays instead of 27 full-size ones)."""
    c = ncell
    ppc, ell = block_geometry(ng, c, margin)
    ghost = margin + 1
    a = local.reshape(c, c, c, ell, ell, ell)
    a = _fold_axis(a, 2, 5, c=c, ppc=ppc, ghost=ghost)   # z
    a = _fold_axis(a, 1, 4, c=c, ppc=ppc, ghost=ghost)   # y
    a = _fold_axis(a, 0, 3, c=c, ppc=ppc, ghost=ghost)   # x
    return a.transpose(0, 3, 1, 4, 2, 5).reshape(ng, ng, ng)


def _extract(grid, *, ncell: int, ng: int, margin: int):
    """[ng,ng,ng] -> [C, L, L, L] local blocks (reverse of _assemble)."""
    c = ncell
    ppc, ell = block_geometry(ng, c, margin)
    ghost = margin + 1
    a = grid.reshape(c, ppc, c, ppc, c, ppc).transpose(0, 2, 4, 1, 3, 5)
    a = _unfold_axis(a, 0, 3, c=c, ppc=ppc, ghost=ghost, ell=ell)   # x
    a = _unfold_axis(a, 1, 4, c=c, ppc=ppc, ghost=ghost, ell=ell)   # y
    a = _unfold_axis(a, 2, 5, c=c, ppc=ppc, ghost=ghost, ell=ell)   # z
    return a.reshape(c ** 3, ell, ell, ell)


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
    matmuls + dense assembly; returns (grid, dropped_count).

    Factor construction, outer product and GEMM all happen inside the
    per-chunk map so the [B,K,L^2] intermediates never round-trip HBM."""
    cc = ncell ** 3
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    origins = _block_origins(ncell, ppc, margin)
    chunk = _cell_chunks(cc)

    def chunk_local(args):
        bp, bm, org = args
        xc, yc, zc, drop = _cic_factors(bp, bm, org, ng=ng,
                                        box_size=box_size, ell=ell)
        # M1[c, k, a*L+b] = X[c,k,a] Y[c,k,b]   (VPU outer product)
        m1 = (xc[:, :, :, None] * yc[:, :, None, :]).reshape(
            chunk, k, ell * ell)
        # local[c, ab, z] = sum_k M1[c,k,ab] Zm[c,k,z]  (MXU batched GEMM)
        loc = jnp.einsum("cka,ckz->caz", m1, zc,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return loc, drop

    xs = (bpos.reshape(-1, chunk, k, 3), bmass.reshape(-1, chunk, k),
          origins.reshape(-1, chunk, 3))
    local, drops = jax.lax.map(chunk_local, xs)
    grid = _assemble(local.reshape(cc, ell, ell, ell),
                     ncell=ncell, ng=ng, margin=margin)
    return grid, jnp.sum(drops)


@partial(jax.jit, static_argnames=("ncell", "ng", "margin"))
def gather_to_buckets(grid, bpos, bmass, *, ncell: int, ng: int, box_size,
                      margin: int = 1):
    """Trilinear interpolation of `grid` (or a [F, ng, ng, ng] stack of
    fields) at every bucketed particle -> [C, K] (or [C, K, F]) values --
    the cic_gather adjoint, scatter/gather-free. Factor construction is
    fused into the per-chunk contraction."""
    squeeze = grid.ndim == 3
    grids = grid[None] if squeeze else grid
    nf = grids.shape[0]
    cc = ncell ** 3
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    origins = _block_origins(ncell, ppc, margin)

    local = jnp.stack([
        _extract(grids[f], ncell=ncell, ng=ng, margin=margin)
        for f in range(nf)], axis=1)            # [C, F, L, L, L]
    chunk = _cell_chunks(cc)

    def chunk_vals(args):
        bp, bm, org, loc = args
        ones = jnp.where(bm > 0, 1.0, 0.0)
        xc, yc, zc, _ = _cic_factors(bp, ones, org, ng=ng,
                                     box_size=box_size, ell=ell)
        # T1[c,k,f,(b,z)] = sum_a X[c,k,a] local[c,f,a,(b,z)] (MXU GEMM)
        t1 = jnp.einsum("cka,cfabz->ckfbz", xc, loc,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        # contract b then z on the VPU
        t2 = jnp.sum(t1 * yc[:, :, None, :, None], axis=3)  # [B,K,F,L]
        return jnp.sum(t2 * zc[:, :, None, :], axis=3)      # [B,K,F]

    xs = (bpos.reshape(-1, chunk, k, 3), bmass.reshape(-1, chunk, k),
          origins.reshape(-1, chunk, 3),
          local.reshape(-1, chunk, nf, ell, ell, ell))
    vals = jax.lax.map(chunk_vals, xs).reshape(cc, k, nf)
    return vals[..., 0] if squeeze else vals


@partial(jax.jit, static_argnames=("ncell", "ng", "margin"))
def gather_gradient_to_buckets(phi, bpos, bmass, *, ncell: int, ng: int,
                               box_size, margin: int = 1):
    """Force = -grad of the CIC-interpolated potential -> [C, K, 3].

    Differentiates the interpolation weights instead of the field
    (the pmwd-style gradient): ONE block extraction of phi and TWO shared
    batched GEMMs replace three gradient grids + three gathers + the FD
    stencil. The interpolation-weight derivative is piecewise constant
    (CIC is piecewise linear), matching the order of the FD4 + CIC combo
    on the Gaussian-smoothed long-range potential."""
    cc = ncell ** 3
    k = bpos.shape[1]
    ppc, ell = block_geometry(ng, ncell, margin)
    origins = _block_origins(ncell, ppc, margin)
    local = _extract(phi, ncell=ncell, ng=ng, margin=margin)
    chunk = _cell_chunks(cc)

    def chunk_vals(args):
        bp, bm, org, loc = args
        ones = jnp.where(bm > 0, 1.0, 0.0)
        x, y, z1, _, dx, dy, dz = _cic_factors(
            bp, ones, org, ng=ng, box_size=box_size, ell=ell,
            derivatives=True)
        # T1 (shared by F_y and F_z): contract a with X
        t1 = jnp.einsum("cka,cabz->ckbz", x, loc,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        # T1d (for F_x): contract a with dX
        t1d = jnp.einsum("cka,cabz->ckbz", dx, loc,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        fx = jnp.sum(jnp.sum(t1d * y[:, :, :, None], axis=2) * z1, axis=2)
        fy = jnp.sum(jnp.sum(t1 * dy[:, :, :, None], axis=2) * z1, axis=2)
        fz = jnp.sum(jnp.sum(t1 * y[:, :, :, None], axis=2) * dz, axis=2)
        return jnp.stack([fx, fy, fz], axis=-1)

    xs = (bpos.reshape(-1, chunk, k, 3), bmass.reshape(-1, chunk, k),
          origins.reshape(-1, chunk, 3),
          local.reshape(-1, chunk, ell, ell, ell))
    return -jax.lax.map(chunk_vals, xs).reshape(cc, k, 3)


# ---------------------------------------------------------------------------
# PM accelerations on buckets
# ---------------------------------------------------------------------------

def _greens(ng: int, box_size, split_scale, deconvolve_cic=True):
    from ..forces.pm import poisson_greens_function
    return poisson_greens_function(ng, box_size, split_scale=split_scale,
                                   deconvolve_cic=deconvolve_cic)


def _use_pallas() -> bool:
    # v5e, 1M/192^3 full fast step: Pallas deposit/gather 213 ms/step vs
    # fused-XLA f32 220 ms/step (both exact; the XLA einsums need
    # Precision.HIGHEST to avoid silent bf16 operand truncation)
    return any(d.platform == "tpu" for d in jax.devices())


@partial(jax.jit, static_argnames=("ncell", "ng", "margin", "split_scale",
                                   "gradient", "use_pallas", "box_size"))
def pm_accelerations_bucketed(bpos, bmass, *, ncell: int, ng: int,
                              box_size, g_const=1.0, split_scale=0.0,
                              margin: int = 1, gradient: str = "spectral",
                              use_pallas: bool | None = None):
    """Long-range PM accelerations for bucketed particles: [C, K, 3]
    for AoS bpos, [3, C, K] for SoA bpos (the production layout).

    gradient="fd4": solve for the potential with ONE inverse FFT and take
    4th-order central differences -- halves the transform count vs the
    spectral i*k gradient (~7 ms per 256^3 transform on v5e via the MXU
    DFT-by-matmul, ops/matmul_fft). Exact on resolved modes with a known
    ~15% response damping at kh=pi/2 (tests/test_pm_gradients.py); under
    the Gaussian split's k-damping the error is <1%.
    """
    from ..physics.initial_conditions import fourier_grid

    if use_pallas is None:
        use_pallas = _use_pallas()
    cc = ncell ** 3
    # SoA [3, C, K] is the production layout (AoS [C, K, 3] can make
    # XLA materialize 42x lane-padded tiled copies; see
    # pallas_short_range). The rod kernels take SoA natively; the jnp
    # fallback paths (CPU) convert at this boundary and convert back,
    # so callers always get accelerations in the layout they passed.
    soa = bpos.ndim == 3 and bpos.shape[0] == 3 and bpos.shape[1] == cc
    bpos_aos = jnp.moveaxis(bpos, 0, -1) if soa else bpos
    cell_volume = (box_size / ng) ** 3
    counts = None
    if use_pallas:
        # rod-resident deposit: one GEMM per (cx, cy) rod with global
        # (fold-free) z; only the x/y ghost fold remains in XLA.
        # Live-slot counts (live-first bucket packing) let the kernels
        # skip the dead capacity padding (~25% of slots at the 1M bench,
        # far more for clustered / grown-capacity states).
        from .pallas_pm_rods import assemble_rods, pallas_deposit_rods
        counts = jnp.sum(
            bmass.reshape(ncell ** 3, -1) > 0, axis=1).astype(jnp.int32)
        blocks, dropped = pallas_deposit_rods(
            bpos, bmass, ncell=ncell, ng=ng, box_size=float(box_size),
            margin=margin, counts=counts)
        grid = assemble_rods(blocks, ncell=ncell, ng=ng, margin=margin)
    else:
        grid, dropped = deposit_from_buckets(
            bpos_aos, bmass, ncell=ncell, ng=ng, box_size=box_size,
            margin=margin)
    # MXU DFT-by-matmul on TPU (ops/matmul_fft): measured ~1-2 ms faster
    # per forward+inverse pair than XLA's FFT at 192^3-256^3 on v5e
    from .matmul_fft import irfftn, rfftn
    rho_k = rfftn(grid / cell_volume)
    green = _greens(ng, box_size, split_scale)
    phi_k = green * rho_k

    if use_pallas and gradient == "fd4":
        # fused CIC x fd4 gather straight from the potential grid: no
        # gradient grids, no block extraction (ops/pallas_pm_rods)
        from .pallas_pm_rods import pallas_gather_fd4
        phi = irfftn(phi_k, s=(ng, ng, ng))
        acc = pallas_gather_fd4(phi, bpos, ncell=ncell, ng=ng,
                                box_size=float(box_size), margin=margin,
                                counts=counts)
        return g_const * acc, dropped
    if gradient == "interp":
        # force = -grad of the interpolated potential: one irfftn, one
        # block extraction, two shared GEMMs (see gather_gradient_to_buckets)
        phi = irfftn(phi_k, s=(ng, ng, ng))
        acc = gather_gradient_to_buckets(
            phi, bpos_aos, bmass, ncell=ncell, ng=ng, box_size=box_size,
            margin=margin)
        if soa:
            acc = jnp.moveaxis(acc, -1, 0)
        return g_const * acc, dropped
    if gradient == "spectral":
        kx, ky, kz, _ = fourier_grid(ng, box_size)
        fields = jnp.stack([
            irfftn(-1j * kvec * phi_k, s=(ng, ng, ng))
            for kvec in (kx, ky, kz)])
    elif gradient == "fd4":
        phi = irfftn(phi_k, s=(ng, ng, ng))
        h = box_size / ng
        fields = jnp.stack([
            -(8.0 * (jnp.roll(phi, -1, ax) - jnp.roll(phi, 1, ax))
              - (jnp.roll(phi, -2, ax) - jnp.roll(phi, 2, ax)))
            / (12.0 * h)
            for ax in range(3)])
    else:
        raise ValueError(f"unknown gradient {gradient!r}")
    # NOTE: a legacy Pallas fields-gather kernel (ops/pallas_pm, removed)
    # used to run here on TPU: at ncell=32 / ng=256 (the 1M pure-PM
    # config) it wedged the device indefinitely (reproduced twice on
    # v5e; the fd4 rod gather and this XLA path both run fine). The
    # spectral / fd4-fields gather therefore stays on the XLA einsum
    # path; the production TreePM/fd4 route above never touches it.
    acc = gather_to_buckets(fields, bpos_aos, bmass, ncell=ncell, ng=ng,
                            box_size=box_size, margin=margin)
    if soa:
        acc = jnp.moveaxis(acc, -1, 0)
    return g_const * acc, dropped
