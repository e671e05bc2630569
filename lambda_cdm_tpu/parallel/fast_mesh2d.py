"""2D-pencil persistent cell-list TreePM stepper.

The 1D slab stepper (parallel/fast_mesh) stops scaling at D = ncell
devices and its ghost volume grows with D; this module shards the
bucketed FastState over a 2D (shx, shy) device mesh -- the TPU-native
counterpart of the reference's 3D MPI rank grid
(domain_decomposition.cpp:10-112): the ICI fabric is a 2D torus, so a
2D (cx, cy)-rod decomposition with z kept local IS the idiomatic
3D-grid analogue (z-pencils, matching parallel/fft.py's pencil FFT).

Cell ordering: this stepper's FastState uses BLOCK-MAJOR cell ids

    cell = (((bx*dy + by)*nxl + lx)*nyl + ly)*nc + cz

(bx, by = device block, lx, ly = local cell within the block) so a
contiguous equal split of the C axis over the flattened (shx, shy) mesh
IS the 2D rod decomposition.  `cell_order2d`/`cell_order2d_inv` convert
to/from the x-major ordering of ops/fast_treepm.

Structure mirrors fast_mesh, composed per axis:
  * halo exchange: x cell-planes over shx, then y-planes of the
    x-extended block over shy -- corners ride the second phase free;
  * short-range: 27-stencil with x/y offsets as halo slices (positions
    pre-unwrapped across the periodic seam), z offsets periodic rolls;
  * PM: bucketed one-hot deposit into the local z-pencil, ghost spills
    ppermute x then y (corners via phase 2), pencil-FFT Poisson solve
    (two all_to_all transposes), local CIC x fd4 gather with x/y halo
    ppermutes;
  * rebucket: two-phase emigrant exchange (x neighbors, then y
    neighbors -- diagonal movers hop twice) + local re-bucket.
Every stray/overflow is counted, never silently dropped
(cluster_comm.cpp:90-216 is the reference pipeline being mirrored).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forces.direct import min_image
from ..forces.treepm import short_range_factor_poly
from ..ops.bucketed_pm import _cic_factors, _fold_axis, \
    block_geometry, _greens
from .mesh import X_AXIS, Y_AXIS


# ---------------------------------------------------------------------------
# planning + cell ordering
# ---------------------------------------------------------------------------

def mesh_fast_plan2d(num_particles: int, box_size: float, pm_grid: int,
                     dxy: tuple, *, split_factor: float = 1.25,
                     cut_factor: float = 4.5, capacity: int = 0,
                     margin: int = 1,
                     occupancy_headroom: float = 1.75) -> dict | None:
    """Static geometry: ncell divisible by BOTH mesh axes, cells >=
    r_cut, pm_grid divisible by ncell and by both axes (pencil FFT)."""
    dx, dy = dxy
    rs = split_factor * box_size / pm_grid
    r_cut = cut_factor * rs
    if pm_grid % dx or pm_grid % dy:
        return None
    lcm = dx * dy // math.gcd(dx, dy)

    def cap_for(nc):
        if capacity > 0:
            return ((capacity + 127) // 128) * 128
        mean_occ = num_particles / max(nc ** 3, 1)
        c = int(math.ceil(occupancy_headroom * mean_occ))
        return max(128, ((c + 127) // 128) * 128)

    best = None
    d = lcm
    while d <= pm_grid:
        if (d % lcm == 0 and pm_grid % d == 0
                and box_size / d >= r_cut and d >= 3
                and d // dx >= 1 and d // dy >= 1):
            cap = cap_for(d)
            cost = d ** 3 * 27 * cap * cap
            if best is None or cost < best[0]:
                best = (cost, d, cap)
        d += lcm
    if best is None:
        return None
    _, ncell, cap = best
    return {"rs": rs, "r_cut": r_cut, "ncell": ncell, "capacity": cap,
            "margin": margin, "dx": dx, "dy": dy}


def cell_order2d(ncell: int, dx: int, dy: int):
    """Permutation p with p[block_major_id] = x_major_id: index arrays
    in x-major layout with p to get the block-major layout."""
    nxl, nyl = ncell // dx, ncell // dy
    bm = jnp.arange(ncell ** 3)
    nc = ncell
    cz = bm % nc
    ly = (bm // nc) % nyl
    lx = (bm // (nc * nyl)) % nxl
    by = (bm // (nc * nyl * nxl)) % dy
    bx = bm // (nc * nyl * nxl * dy)
    cx = bx * nxl + lx
    cy = by * nyl + ly
    return ((cx * nc) + cy) * nc + cz


def cell_order2d_inv(ncell: int, dx: int, dy: int):
    """Inverse permutation: q with q[x_major_id] = block_major_id."""
    p = cell_order2d(ncell, dx, dy)
    return jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0]))


# ---------------------------------------------------------------------------
# halo exchange helpers (inside shard_map)
# ---------------------------------------------------------------------------

def _ring(n: int, shift: int):
    return [(i, (i + shift) % n) for i in range(n)]


def _halo_extend(blk, axis: int, *, n_dev: int, axis_name: str):
    """Extend `axis` by one plane each side via two ppermutes."""
    n = blk.shape[axis]
    lo = jax.lax.ppermute(
        jax.lax.slice_in_dim(blk, n - 1, n, axis=axis),
        axis_name, _ring(n_dev, +1))
    hi = jax.lax.ppermute(
        jax.lax.slice_in_dim(blk, 0, 1, axis=axis),
        axis_name, _ring(n_dev, -1))
    return jnp.concatenate([lo, blk, hi], axis=axis)


def _unwrap_axis(ext, axis: int, coord: int, *, box_size, n_dev,
                 axis_name):
    """Shift halo planes' `coord` coordinate across the periodic seam."""
    di = jax.lax.axis_index(axis_name)
    lo_shift = jnp.where(di == 0, -box_size, 0.0)
    hi_shift = jnp.where(di == n_dev - 1, box_size, 0.0)
    c = ext[..., coord]
    idx_lo = (slice(None),) * axis + (slice(0, 1),)
    idx_hi = (slice(None),) * axis + (slice(-1, None),)
    c = c.at[idx_lo].add(lo_shift)
    c = c.at[idx_hi].add(hi_shift)
    return ext.at[..., coord].set(c)


# ---------------------------------------------------------------------------
# short-range on the (x, y)-halo-extended block
# ---------------------------------------------------------------------------

def _local_short_range2d(bp_ext, bm_ext, *, box_size, rs, softening,
                         nxl: int, nyl: int, nc: int, cap: int):
    """[nxl+2, nyl+2, nc, K] halo-extended block -> short-range acc for
    the inner [nxl, nyl, nc, K] cells. x/y offsets are halo slices
    (positions pre-unwrapped), z offsets periodic rolls."""
    soft2 = softening * softening
    acc = jnp.zeros((nxl, nyl, nc, cap, 3), bp_ext.dtype)
    center_p = bp_ext[1:1 + nxl, 1:1 + nyl]

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            nb_p = bp_ext[1 + ox:1 + ox + nxl, 1 + oy:1 + oy + nyl]
            nb_m = bm_ext[1 + ox:1 + ox + nxl, 1 + oy:1 + oy + nyl]
            for oz in (-1, 0, 1):
                np_pos = jnp.roll(nb_p, -oz, axis=2)
                np_mass = jnp.roll(nb_m, -oz, axis=2)

                def slab(carry, xsl):
                    cp, nb_pos, nb_mass = xsl     # [nyl, nc, K, ...]
                    d = min_image(nb_pos[:, :, None, :, :]
                                  - cp[:, :, :, None, :], box_size)
                    r2 = jnp.sum(d * d, axis=-1) + soft2
                    inv_r = jax.lax.rsqrt(r2)
                    r = r2 * inv_r
                    s = short_range_factor_poly(r, rs)
                    w = (nb_mass[:, :, None, :] * s
                         * (inv_r * inv_r * inv_r))
                    return carry, jnp.sum(w[..., None] * d, axis=3)

                _, a = jax.lax.scan(slab, None,
                                    (center_p, np_pos, np_mass))
                acc = acc + a
    return acc


# ---------------------------------------------------------------------------
# PM deposit / gather on the local z-pencil
# ---------------------------------------------------------------------------

def _fold_open(a, axis_blk: int, axis_loc: int, *, ppc: int, ghost: int):
    """Open (non-periodic) overlap fold along one axis pair: resolve
    interior block overlaps, return (folded, lo_spill, hi_spill).
    axis_blk indexes blocks, axis_loc the local window (length L); the
    spills keep the full a-shape minus those two axes collapsed to
    (1, ghost)."""
    ell = a.shape[axis_loc]
    nbl = a.shape[axis_blk]

    def loc(sl):
        idx = [slice(None)] * a.ndim
        idx[axis_loc] = sl
        return tuple(idx)

    def blk(sl):
        idx = [slice(None)] * a.ndim
        idx[axis_blk] = sl
        return tuple(idx)

    main = a[loc(slice(ghost, ghost + ppc))]
    lo = a[loc(slice(0, ghost))]
    hi = a[loc(slice(ghost + ppc, ell))]

    pad_lo = jnp.zeros_like(main)
    pad_lo = pad_lo.at[loc(slice(ppc - ghost, ppc))].set(lo)
    main = main.at[blk(slice(0, nbl - 1))].add(pad_lo[blk(slice(1, nbl))])
    lo_spill = jnp.take(lo, jnp.array([0]), axis=axis_blk)

    pad_hi = jnp.zeros_like(main)
    pad_hi = pad_hi.at[loc(slice(0, ell - ghost - ppc))].set(hi)
    main = main.at[blk(slice(1, nbl))].add(pad_hi[blk(slice(0, nbl - 1))])
    hi_spill = jnp.take(hi, jnp.array([nbl - 1]), axis=axis_blk)
    return main, lo_spill, hi_spill


def _origins2d(cl, *, nxl, nyl, nc, ppc, ghost, x0_cells, y0_cells):
    lx = jnp.arange(cl) // (nyl * nc)
    ly = (jnp.arange(cl) // nc) % nyl
    cz = jnp.arange(cl) % nc
    return jnp.stack([
        (x0_cells + lx) * ppc - ghost,
        (y0_cells + ly) * ppc - ghost,
        cz * ppc - ghost], axis=-1).astype(jnp.int32)


def _local_deposit_pencil(bpos, bmass, *, nc, nxl, nyl, cap, ng, box_size,
                          margin, x0_cells, y0_cells, dx, dy):
    """Bucketed CIC deposit of local [Cl, K] cells into the device's
    [ng/dx, ng/dy, ng] z-pencil; x/y ghost spills ride one ppermute per
    axis (the y phase carries the corner spills for free)."""
    ppc, ell = block_geometry(ng, nc, margin)
    ghost = margin + 1
    cl = nxl * nyl * nc

    origins = _origins2d(cl, nxl=nxl, nyl=nyl, nc=nc, ppc=ppc,
                         ghost=ghost, x0_cells=x0_cells, y0_cells=y0_cells)
    x, y, zm, dropped = _cic_factors(bpos, bmass, origins, ng=ng,
                                     box_size=box_size, ell=ell)
    m1 = (x[:, :, :, None] * y[:, :, None, :]).reshape(cl, cap, ell * ell)
    loc = jnp.einsum("cka,ckz->caz", m1, zm,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    loc = loc.reshape(nxl, nyl, nc, ell, ell, ell)

    # z is fully local: periodic fold
    loc = _fold_axis(loc, 2, 5, c=nc, ppc=ppc, ghost=ghost)
    # -> [nxl, nyl, nc, ell(x), ell(y), ppc(z)]

    # open x fold across local blocks; spills to x neighbors
    loc, xlo, xhi = _fold_open(loc, 0, 3, ppc=ppc, ghost=ghost)
    # -> [nxl, nyl, nc, ppc(x), ell(y), ppc(z)], spills [1, nyl, nc,
    #    ghost(x), ell(y), ppc(z)]
    from_right = jax.lax.ppermute(xlo, X_AXIS, _ring(dx, -1))
    from_left = jax.lax.ppermute(xhi, X_AXIS, _ring(dx, +1))

    # merge (nxl, ppc) -> X rows so received spills overlap-add cleanly
    a = loc.transpose(0, 3, 1, 2, 4, 5).reshape(
        nxl * ppc, nyl, nc, ell, ppc)

    def x_spill_rows(sp):
        # [1, nyl, nc, ghost, ell, ppc] -> [ghost, nyl, nc, ell, ppc]
        return sp[0].transpose(2, 0, 1, 3, 4)

    a = a.at[-ghost:].add(x_spill_rows(from_right))
    a = a.at[:ghost].add(x_spill_rows(from_left))

    # open y fold on the x-merged layout (y spills now carry the
    # corner contributions received in the x phase)
    a2, ylo, yhi = _fold_open(a, 1, 3, ppc=ppc, ghost=ghost)
    # a2 [X, nyl, nc, ppc(y), ppc(z)], spills [X, 1, nc, ghost(y), ppc]
    from_above = jax.lax.ppermute(ylo, Y_AXIS, _ring(dy, -1))
    from_below = jax.lax.ppermute(yhi, Y_AXIS, _ring(dy, +1))

    g = a2.transpose(0, 1, 3, 2, 4).reshape(
        nxl * ppc, nyl * ppc, nc * ppc)

    def y_spill_rows(sp):
        # [X, 1, nc, ghost(y), ppc(z)] -> [X, ghost, nc*ppc]
        return sp[:, 0].transpose(0, 2, 1, 3).reshape(
            nxl * ppc, ghost, nc * ppc)

    g = g.at[:, -ghost:].add(y_spill_rows(from_above))
    g = g.at[:, :ghost].add(y_spill_rows(from_below))
    return g, dropped


def _poisson_pencil(pencil, green, *, ng: int, dx: int, dy: int,
                    ax_x=X_AXIS, ax_y=Y_AXIS):
    """z-pencil-decomposed FFT Poisson solve inside shard_map:
    pencil [ng/dx, ng/dy, ng] -> phi pencil, via rfft(z) -> all_to_all
    y<->z-chunks (shy) -> fft(y) -> all_to_all x<->y-chunks (shx) ->
    fft(x) -> multiply Green's -> inverse path.

    `ax_x`/`ax_y` name the mesh axes sharding the pencil's first/second
    grid axes; either may be a TUPLE of axes (the 3D block stepper runs
    this with ax_y=(shy, shz): a 3D cube becomes a z-pencil with y
    split over the combined dy*dz axis, fast_mesh3d._poisson_block)."""
    xl, yl = ng // dx, ng // dy
    nz = ng // 2 + 1
    nzp = -(-nz // dy) * dy              # pad so z splits over ax_y
    nzl = nzp // dy
    ylx = ng // dx                       # y-chunk per x-device

    gz = jnp.fft.rfft(pencil, axis=2)                       # [xl, yl, nz]
    gz = jnp.pad(gz, ((0, 0), (0, 0), (0, nzp - nz)))

    # make y full: trade z-chunks over ax_y
    ch = gz.reshape(xl, yl, dy, nzl).transpose(2, 0, 1, 3)
    rec = jax.lax.all_to_all(ch, ax_y, 0, 0, tiled=False)
    gy = rec.transpose(1, 0, 2, 3).reshape(xl, ng, nzl)     # y full
    gy = jnp.fft.fft(gy, axis=1)

    # make x full: trade y-chunks over ax_x
    ch = gy.reshape(xl, dx, ylx, nzl).transpose(1, 0, 2, 3)
    rec = jax.lax.all_to_all(ch, ax_x, 0, 0, tiled=False)
    gx = rec.reshape(ng, ylx, nzl)                          # x full
    gk = jnp.fft.fft(gx, axis=0)

    # Green's slice: y window by x-device, z window by y-device
    # (axis_index linearizes tuple axes first-major, matching the
    # tuple-axis all_to_all device order)
    dix = jax.lax.axis_index(ax_x)
    diy = jax.lax.axis_index(ax_y)
    gpad = jnp.pad(green, ((0, 0), (0, 0), (0, nzp - nz)))
    g1 = jax.lax.dynamic_slice_in_dim(gpad, dix * ylx, ylx, axis=1)
    g_loc = jax.lax.dynamic_slice_in_dim(g1, diy * nzl, nzl, axis=2)
    pk = gk * g_loc

    # inverse path
    pt = jnp.fft.ifft(pk, axis=0)
    ch = pt.reshape(dx, xl, ylx, nzl)
    rec = jax.lax.all_to_all(ch, ax_x, 0, 0, tiled=False)
    py = rec.transpose(1, 0, 2, 3).reshape(xl, ng, nzl)
    py = jnp.fft.ifft(py, axis=1)
    ch = py.reshape(xl, dy, yl, nzl).transpose(1, 0, 2, 3)
    rec = jax.lax.all_to_all(ch, ax_y, 0, 0, tiled=False)
    pz = rec.transpose(1, 2, 0, 3).reshape(xl, yl, nzp)
    return jnp.fft.irfft(pz[:, :, :nz], n=ng, axis=2).real \
        .astype(jnp.float32)


def _extract_open(field, *, nblk: int, ppc: int, ghost: int, axis: int):
    """Overlapping windows along one OPEN axis: field has
    ghost + nblk*ppc + ghost rows on `axis`; returns windows of length
    L = ppc + 2*ghost per block, stacked as (block, L) replacing the
    axis. Requires 2*ghost <= ppc (tail padding trick)."""
    ell = ppc + 2 * ghost
    n_rows = nblk * ppc
    pad = ppc - 2 * ghost
    if pad > 0:
        padw = [(0, 0)] * field.ndim
        padw[axis] = (0, pad)
        field = jnp.pad(field, padw)

    def take(a, b):
        idx = [slice(None)] * field.ndim
        idx[axis] = slice(a, b)
        return field[tuple(idx)]

    sh = list(field.shape)
    a1 = take(0, n_rows).reshape(sh[:axis] + [nblk, ppc] + sh[axis + 1:])
    a2 = take(ppc, ppc + n_rows).reshape(
        sh[:axis] + [nblk, ppc] + sh[axis + 1:])

    def cut(a):
        idx = [slice(None)] * a.ndim
        idx[axis + 1] = slice(0, ell - ppc)
        return a[tuple(idx)]

    return jnp.concatenate([a1, cut(a2)], axis=axis + 1)


def _local_gather_fd4_pencil(phi_loc, bpos, *, nc, nxl, nyl, cap, ng,
                             box_size, margin, x0_cells, y0_cells,
                             dx, dy):
    """fd4 gradient + CIC gather on the local [ng/dx, ng/dy, ng] pencil;
    x/y halos (margin+3 planes) arrive via 2-phase ppermutes (phase 2
    ships the corner halos of the x-extended pencil)."""
    ppc, ell = block_geometry(ng, nc, margin)
    ghost = margin + 1
    h = box_size / ng
    gh4 = ghost + 2
    cl = nxl * nyl * nc

    lo = jax.lax.ppermute(phi_loc[-gh4:], X_AXIS, _ring(dx, +1))
    hi = jax.lax.ppermute(phi_loc[:gh4], X_AXIS, _ring(dx, -1))
    ext = jnp.concatenate([lo, phi_loc, hi], axis=0)
    lo = jax.lax.ppermute(ext[:, -gh4:], Y_AXIS, _ring(dy, +1))
    hi = jax.lax.ppermute(ext[:, :gh4], Y_AXIS, _ring(dy, -1))
    ext = jnp.concatenate([lo, ext, hi], axis=1)

    c4 = 1.0 / (12.0 * h)

    def dslice(f, axis):
        n = f.shape[axis]

        def sl(a, b):
            idx = [slice(None)] * f.ndim
            idx[axis] = slice(a, n + b if b < 0 else None)
            return f[tuple(idx)]
        return (8.0 * (sl(3, -1) - sl(1, -3)) - (sl(4, 0) - sl(0, -4))) \
            * c4

    def droll(f, axis):
        return (8.0 * (jnp.roll(f, -1, axis) - jnp.roll(f, 1, axis))
                - (jnp.roll(f, -2, axis) - jnp.roll(f, 2, axis))) * c4

    fx = -dslice(ext, 0)[:, 2:-2]        # [gh+X+gh, gh+Y+gh, ng]
    fy = -dslice(ext, 1)[2:-2]
    fz = -droll(ext[2:-2, 2:-2], 2)

    def windows(field):
        # open-extract x and y windows, periodic z windows
        a = _extract_open(field, nblk=nxl, ppc=ppc, ghost=ghost, axis=0)
        a = _extract_open(a, nblk=nyl, ppc=ppc, ghost=ghost, axis=2)
        # a: [nxl, L, nyl, L, ng]
        a = a.transpose(0, 2, 1, 3, 4)   # [nxl, nyl, L, L, ng]
        zw = []
        for zc in range(nc):
            idx = (jnp.arange(ell) + (zc * ppc - ghost)) % ng
            zw.append(jnp.take(a, idx, axis=4))
        a = jnp.stack(zw, axis=2)        # [nxl, nyl, nc, L, L, L]
        return a.reshape(cl, ell, ell, ell)

    fields = jnp.stack([windows(fx), windows(fy), windows(fz)], axis=1)

    origins = _origins2d(cl, nxl=nxl, nyl=nyl, nc=nc, ppc=ppc,
                         ghost=ghost, x0_cells=x0_cells, y0_cells=y0_cells)
    ones = jnp.ones((cl, cap), jnp.float32)
    x, y, z1, _ = _cic_factors(bpos, ones, origins, ng=ng,
                               box_size=box_size, ell=ell)
    t1 = jnp.einsum("cka,cfabz->ckfbz", x, fields,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    t2 = jnp.sum(t1 * y[:, :, None, :, None], axis=3)
    return jnp.sum(t2 * z1[:, :, None, :], axis=3)       # [Cl, K, 3]


# ---------------------------------------------------------------------------
# full force (shard_map over the 2D device mesh)
# ---------------------------------------------------------------------------

def mesh_fast_accel2d(bpos, bmass, *, mesh: Mesh, box_size, ng: int,
                      ncell: int, capacity: int, margin: int, rs,
                      softening, g_const):
    """Sharded TreePM accelerations for block-major bucketed [C, K]
    state -> [C, K, 3] (+ dropped count). Arrays shard along C over the
    flattened (shx, shy) mesh."""
    dx = mesh.shape[X_AXIS]
    dy = mesh.shape[Y_AXIS]
    nc, cap = ncell, capacity
    nxl, nyl = nc // dx, nc // dy
    cl = nxl * nyl * nc
    green = _greens(ng, box_size, rs)
    cell_volume = (box_size / ng) ** 3

    def local(bp, bm, grn):
        dix = jax.lax.axis_index(X_AXIS)
        diy = jax.lax.axis_index(Y_AXIS)
        x0 = (dix * nxl).astype(jnp.float32)
        y0 = (diy * nyl).astype(jnp.float32)
        blk_p = bp.reshape(nxl, nyl, nc, cap, 3)
        blk_m = bm.reshape(nxl, nyl, nc, cap)

        # --- short range: 2-phase halo + 27-stencil
        bp_ext = _halo_extend(blk_p, 0, n_dev=dx, axis_name=X_AXIS)
        bm_ext = _halo_extend(blk_m, 0, n_dev=dx, axis_name=X_AXIS)
        bp_ext = _unwrap_axis(bp_ext, 0, 0, box_size=box_size, n_dev=dx,
                              axis_name=X_AXIS)
        bp_ext = _halo_extend(bp_ext, 1, n_dev=dy, axis_name=Y_AXIS)
        bm_ext = _halo_extend(bm_ext, 1, n_dev=dy, axis_name=Y_AXIS)
        bp_ext = _unwrap_axis(bp_ext, 1, 1, box_size=box_size, n_dev=dy,
                              axis_name=Y_AXIS)
        acc_s = _local_short_range2d(
            bp_ext, bm_ext, box_size=box_size, rs=rs,
            softening=softening, nxl=nxl, nyl=nyl, nc=nc, cap=cap)

        # --- long range: pencil deposit -> pencil FFT -> pencil gather
        pencil, dropped = _local_deposit_pencil(
            bp.reshape(cl, cap, 3), bm.reshape(cl, cap), nc=nc, nxl=nxl,
            nyl=nyl, cap=cap, ng=ng, box_size=box_size, margin=margin,
            x0_cells=x0, y0_cells=y0, dx=dx, dy=dy)
        phi = _poisson_pencil(pencil / cell_volume, grn, ng=ng, dx=dx,
                              dy=dy)
        acc_l = _local_gather_fd4_pencil(
            phi, bp.reshape(cl, cap, 3), nc=nc, nxl=nxl, nyl=nyl,
            cap=cap, ng=ng, box_size=box_size, margin=margin,
            x0_cells=x0, y0_cells=y0, dx=dx, dy=dy)

        acc = g_const * (acc_l.reshape(acc_s.shape) + acc_s)
        dropped = jax.lax.psum(jax.lax.psum(dropped, X_AXIS), Y_AXIS)
        return acc.reshape(cl, cap, 3), dropped[None]

    acc, dropped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P((X_AXIS, Y_AXIS)), P((X_AXIS, Y_AXIS)), P()),
        out_specs=(P((X_AXIS, Y_AXIS)), P((X_AXIS, Y_AXIS))))(
            bpos, bmass, green)
    return acc, dropped[0]


# ---------------------------------------------------------------------------
# sharded rebucket: two-phase emigrant exchange
# ---------------------------------------------------------------------------

def mesh_rebucket2d(bpos, bvel, bmass, bids, bacc, *, mesh: Mesh,
                    box_size, ncell: int, capacity: int,
                    mig_capacity: int = 0):
    """Re-bucket the 2D-sharded state: emigrants hop to the +-x block
    neighbor first, then +-y (diagonal movers take both hops); each hop
    is one capacity-bounded ppermute pair. Strays/overflow counted."""
    dx = mesh.shape[X_AXIS]
    dy = mesh.shape[Y_AXIS]
    nc, cap = ncell, capacity
    nxl, nyl = nc // dx, nc // dy
    cl = nxl * nyl * nc
    if mig_capacity <= 0:
        # movers live within one cell plane of a block boundary: the
        # x-boundary plane spans nyl*nc cells, the y-boundary nxl*nc
        mig_capacity = max(256, (max(nxl, nyl) * nc * cap) // 4)
    mig = mig_capacity

    def pack(mask, arrs, fill):
        rank = jnp.cumsum(mask) - 1
        slot = jnp.where(mask, rank, mig)
        out = []
        for a, f in zip(arrs, fill):
            buf = jnp.full((mig,) + a.shape[1:], f, a.dtype)
            out.append(buf.at[slot].set(a, mode="drop"))
        lost = jnp.sum(mask & (rank >= mig))
        return out, lost

    def exchange(axis_name, n_dev, delta, arrs):
        """One +-1 hop along axis_name for rows flagged by delta
        (0 stay, 1 up, n_dev-1 down). Returns merged arrays + lost."""
        pos, vel, acc, mass, ids = arrs
        live = mass > 0
        up = live & (delta == 1) & (n_dev > 1)
        down = live & (delta == n_dev - 1) & ~up & (n_dev > 1)
        strays = jnp.sum(live & ~(delta == 0) & ~up & ~down)

        ubuf, lost_u = pack(up, arrs, (0.0, 0.0, 0.0, 0.0, -1))
        dbuf, lost_d = pack(down, arrs, (0.0, 0.0, 0.0, 0.0, -1))
        recv_d = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, _ring(n_dev, +1)),
            ubuf)    # my up-goers arrive at +1; I receive from -1
        recv_u = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, _ring(n_dev, -1)),
            dbuf)
        mass_stay = jnp.where(live & (delta == 0), mass, 0.0)
        merged = [jnp.concatenate([pos, recv_d[0], recv_u[0]]),
                  jnp.concatenate([vel, recv_d[1], recv_u[1]]),
                  jnp.concatenate([acc, recv_d[2], recv_u[2]]),
                  jnp.concatenate([mass_stay, recv_d[3], recv_u[3]]),
                  jnp.concatenate([ids, recv_d[4], recv_u[4]])]
        return merged, lost_u + lost_d + strays

    def local(bp, bv, bm, bi, ba):
        dix = jax.lax.axis_index(X_AXIS)
        diy = jax.lax.axis_index(Y_AXIS)
        arrs = [bp.reshape(-1, 3), bv.reshape(-1, 3), ba.reshape(-1, 3),
                bm.reshape(-1), bi.reshape(-1)]

        def blocks_of(pos):
            cell = jnp.clip(jnp.floor(pos / box_size * nc)
                            .astype(jnp.int32), 0, nc - 1)
            return cell[:, 0] // nxl, cell[:, 1] // nyl, cell

        # phase 1: x hop
        bx, _, _ = blocks_of(arrs[0])
        delta_x = jnp.mod(bx - dix, dx)
        arrs, lost1 = exchange(X_AXIS, dx, delta_x, arrs)

        # phase 2: y hop (on the merged set)
        _, by, _ = blocks_of(arrs[0])
        delta_y = jnp.mod(by - diy, dy)
        arrs, lost2 = exchange(Y_AXIS, dy, delta_y, arrs)

        pos_a, vel_a, acc_a, mass_a, ids_a = arrs
        bx, by, cell = blocks_of(pos_a)
        in_blk = (bx == dix) & (by == diy)
        livea = mass_a > 0
        lxa = cell[:, 0] - dix * nxl
        lya = cell[:, 1] - diy * nyl
        cid = jnp.where(livea & in_blk,
                        (lxa * nyl + lya) * nc + cell[:, 2], cl)
        strays = jnp.sum(livea & ~in_blk)

        order = jnp.argsort(cid)
        cid_s = cid[order]
        na = cid.shape[0]
        idx = jnp.arange(na, dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.ones((1,), bool),
                                    cid_s[1:] != cid_s[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
        rank = idx - run_start
        ok = (rank < cap) & (cid_s < cl)
        slot = jnp.where(ok, cid_s * cap + rank, cl * cap)
        overflow = jnp.sum(~ok & (cid_s < cl))

        # inverse slot map + row gathers: XLA [N,3] scatters are ~8x
        # slower than gathers on TPU (forces/treepm.bucket_src_map)
        src = jnp.full((cl * cap,), na, jnp.int32).at[slot].set(
            order.astype(jnp.int32), mode="drop")

        def regather(x, fill=0.0):
            pad = jnp.full((1,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, pad], axis=0)[src]

        nbp = regather(pos_a).reshape(cl, cap, 3)
        nbv = regather(vel_a).reshape(cl, cap, 3)
        nba = regather(acc_a).reshape(cl, cap, 3)
        nbm = regather(mass_a).reshape(cl, cap)
        nbi = regather(ids_a, -1).reshape(cl, cap)

        counts = jnp.stack([overflow + lost1 + lost2 + strays,
                            jnp.sum(mass_a > 0)])
        counts = jax.lax.psum(jax.lax.psum(counts, X_AXIS), Y_AXIS)
        return nbp, nbv, nbm, nbi, nba, counts[None]

    nbp, nbv, nbm, nbi, nba, counts = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P((X_AXIS, Y_AXIS)),) * 5,
        out_specs=(P((X_AXIS, Y_AXIS)),) * 5 + (P((X_AXIS, Y_AXIS)),))(
            bpos, bvel, bmass, bids, bacc)
    return nbp, nbv, nbm, nbi, nba, counts[0, 0]


# ---------------------------------------------------------------------------
# public API: init / segment / run (mirrors parallel/fast_mesh)
# ---------------------------------------------------------------------------

def initialize_mesh_fast2d(positions, velocities, masses, scale_factor,
                           *, mesh: Mesh, box_size, pm_grid, softening,
                           g_const=43.0071057317063, split_factor=1.25,
                           cut_factor=4.5, margin=1, capacity=0,
                           time=0.0, step=0, h0_internal=100.0,
                           kick_mode="reference", sf_method="rk4",
                           cosmological=True, plan_override=None,
                           ids=None):
    """Bucket (block-major cell order) + shard over the 2D mesh + prime
    accelerations. Returns (FastState, plan kwargs for mesh_fast_run2d),
    or raises if the geometry cannot shard. `plan_override`/`ids` let
    the engine rebuild at a grown capacity while keeping the geometry
    and persistent particle identities (grow-and-retry)."""
    from ..forces.treepm import bucket_particles
    from ..ops.fast_treepm import FastState

    dx = mesh.shape[X_AXIS]
    dy = mesh.shape[Y_AXIS]
    plan = plan_override or mesh_fast_plan2d(
        positions.shape[0], float(box_size), pm_grid, (dx, dy),
        split_factor=split_factor, cut_factor=cut_factor,
        capacity=capacity, margin=margin)
    if plan is None:
        raise ValueError(
            f"mesh_fast_plan2d: box/pm_grid {pm_grid} cannot shard over "
            f"a ({dx}, {dy}) mesh with cells >= r_cut")
    nc, cap = plan["ncell"], plan["capacity"]

    bpos, bmass, pslot, ovf = bucket_particles(
        positions, masses, box_size, ncell=nc, capacity=cap)
    nslots = bpos.shape[0] * bpos.shape[1]
    safe = jnp.where(pslot >= 0, pslot, nslots)
    bvel = jnp.zeros_like(bpos).reshape(-1, 3).at[safe].set(
        velocities, mode="drop").reshape(bpos.shape)
    pids = (jnp.arange(positions.shape[0], dtype=jnp.int32)
            if ids is None else ids.astype(jnp.int32))
    bids = jnp.full((nslots,), -1, jnp.int32).at[safe].set(
        pids, mode="drop").reshape(bmass.shape)

    # x-major -> block-major cell order
    perm = cell_order2d(nc, dx, dy)
    bpos, bvel = bpos[perm], bvel[perm]
    bmass, bids = bmass[perm], bids[perm]

    shard = NamedSharding(mesh, P((X_AXIS, Y_AXIS)))
    rep = NamedSharding(mesh, P())
    fstate = FastState(
        bpos=jax.device_put(bpos, shard),
        bvel=jax.device_put(bvel, shard),
        bmass=jax.device_put(bmass, shard),
        ids=jax.device_put(bids, shard),
        acc=jax.device_put(jnp.zeros_like(bpos), shard),
        scale_factor=jax.device_put(
            jnp.asarray(scale_factor, jnp.float32), rep),
        time=jax.device_put(jnp.asarray(time, jnp.float32), rep),
        step=jax.device_put(jnp.asarray(step, jnp.int32), rep),
        overflow=jax.device_put(ovf.astype(jnp.int32), rep),
        dropped=jax.device_put(jnp.zeros((), jnp.int32), rep))

    kw = dict(box_size=float(box_size), ng=pm_grid, ncell=nc,
              capacity=cap, margin=plan["margin"], rs=float(plan["rs"]),
              softening=float(softening), g_const=float(g_const),
              h0_internal=float(h0_internal), kick_mode=str(kick_mode),
              sf_method=str(sf_method), cosmological=bool(cosmological))

    acc, dropped = mesh_fast_accel2d(
        fstate.bpos, fstate.bmass, mesh=mesh, box_size=kw["box_size"],
        ng=pm_grid, ncell=nc, capacity=cap, margin=kw["margin"],
        rs=kw["rs"], softening=kw["softening"], g_const=kw["g_const"])
    fstate = fstate.replace(acc=acc,
                            dropped=fstate.dropped
                            + dropped.astype(jnp.int32))
    return fstate, kw


@partial(jax.jit, static_argnames=(
    "mesh", "box_size", "ng", "ncell", "capacity", "margin", "rs",
    "softening", "g_const", "h0_internal", "kick_mode", "sf_method",
    "cosmological", "n_steps"))
def _mesh_fast_segment2d(fstate, params, dt, *, mesh, box_size, ng,
                         ncell, capacity, margin, rs, softening, g_const,
                         h0_internal=100.0, kick_mode="reference",
                         sf_method="rk4", cosmological=True, n_steps=1):
    from ..physics.integrators import (drift_factor, kick_factor,
                                       update_scale_factor,
                                       wrap_positions)

    def one_step(fs, _):
        a0 = fs.scale_factor
        vel = fs.bvel + fs.acc * (0.5 * dt) * kick_factor(a0, kick_mode)
        if cosmological:
            a_half = update_scale_factor(params, a0, 0.5 * dt,
                                         h0_internal, sf_method)
            a1 = update_scale_factor(params, a_half, 0.5 * dt,
                                     h0_internal, sf_method)
        else:
            a_half, a1 = a0, a0
        pos = fs.bpos + vel * dt * drift_factor(a_half, kick_mode)
        pos = jnp.where((fs.bmass > 0)[..., None],
                        wrap_positions(pos, box_size), 0.0)
        fs = fs.replace(bpos=pos, bvel=vel, scale_factor=a1,
                        time=fs.time + dt, step=fs.step + 1)
        acc_new, dropped = mesh_fast_accel2d(
            fs.bpos, fs.bmass, mesh=mesh, box_size=box_size, ng=ng,
            ncell=ncell, capacity=capacity, margin=margin, rs=rs,
            softening=softening, g_const=g_const)
        vel = fs.bvel + acc_new * (0.5 * dt) * kick_factor(a1, kick_mode)
        return fs.replace(bvel=vel, acc=acc_new,
                          dropped=fs.dropped
                          + dropped.astype(jnp.int32)), None

    fstate, _ = jax.lax.scan(one_step, fstate, None, length=n_steps)
    return fstate


def mesh_fast_run2d(fstate, params, dt, *, mesh: Mesh, rebucket_every=16,
                    n_steps=1, steps_since_rebucket: int = 0,
                    on_overflow="count", **kw):
    """Advance n_steps with two-phase re-bucketing between segments.
    `steps_since_rebucket` carries the cadence across chunked calls
    (see ops/fast_treepm.fast_run). `on_overflow="raise"` throws
    BucketOverflowError with the INTACT pre-rebucket state when a
    rebucket would lose particles (engine grow-and-retry)."""
    remaining = n_steps
    since = max(0, int(steps_since_rebucket))
    while remaining > 0:
        if since >= rebucket_every:
            nbp, nbv, nbm, nbi, nba, bad = mesh_rebucket2d(
                fstate.bpos, fstate.bvel, fstate.bmass, fstate.ids,
                fstate.acc, mesh=mesh, box_size=kw["box_size"],
                ncell=kw["ncell"], capacity=kw["capacity"])
            if on_overflow == "raise" and int(bad) > 0:
                from ..ops.fast_treepm import BucketOverflowError
                raise BucketOverflowError(fstate,
                                          n_steps - remaining)
            fstate = fstate.replace(
                bpos=nbp, bvel=nbv, bmass=nbm, ids=nbi, acc=nba,
                overflow=fstate.overflow + bad.astype(jnp.int32))
            since = 0
        seg = min(rebucket_every - since, remaining)
        fstate = _mesh_fast_segment2d(fstate, params, dt, mesh=mesh,
                                      n_steps=seg, **kw)
        remaining -= seg
        since += seg
    return fstate
