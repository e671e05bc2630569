"""Multi-chip persistent cell-list TreePM stepper (the fast stepper's
mesh twin).

Round-2 gap (PARITY "round-3 queue"): mesh-mode treepm re-bucketed and
re-deposited per force call. This module keeps the bucketed FastState
RESIDENT and SHARDED across the device mesh between steps:

  * FastState arrays [C, K, ...] shard along C (cell ids are x-major:
    cell = ((cx nc) + cy) nc + cz, so an equal C-split IS an x-slab
    decomposition -- the reference's MPI_Cart x-split,
    domain_decomposition.cpp:10-112);
  * short-range: ONE ppermute each way ships the boundary cell PLANES
    (positions pre-unwrapped across the periodic seam), then the
    27-stencil runs on the halo-extended local block -- the reference's
    exchange_ghost_particles -> local force pipeline
    (cluster_comm.cpp:166-216) without per-particle repacking;
  * PM long-range: bucketed one-hot deposit into halo-extended local
    slabs, spill planes ppermuted and added (the Alltoall ghost
    reduction), slab-transposed distributed FFT Poisson solve
    (parallel/fft.py), phi halo exchange, local CIC x fd4 gather;
  * every `rebucket_every` steps: local re-bucket + capacity-bounded
    emigrant exchange to the +-x neighbors (drift between rebuckets is
    bounded by the deposit margin, which is < one cell plane, so only
    adjacent slabs ever receive particles; farther strays are COUNTED
    as dropped, never silently lost).

Everything is shard_map + explicit collectives: no GSPMD guessing in the
hot loop, collectives ride ICI.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..forces.direct import min_image
from ..forces.treepm import short_range_factor_poly
from ..ops.bucketed_pm import _cic_factors, _fold_axis, _unfold_axis, \
    block_geometry, _greens
from .mesh import SHARD_AXIS


# ---------------------------------------------------------------------------
# planning
# ---------------------------------------------------------------------------

def mesh_fast_plan(num_particles: int, box_size: float, pm_grid: int,
                   n_dev: int, *, split_factor: float = 1.25,
                   cut_factor: float = 4.5, capacity: int = 0,
                   margin: int = 1,
                   occupancy_headroom: float = 1.75) -> dict | None:
    """Static geometry for the sharded fast stepper: ncell must divide
    pm_grid, be a multiple of n_dev (one whole x-plane block per device),
    give cells >= r_cut, and pm_grid must split into x-slabs. Returns
    None when the box cannot host it (callers fall back to the stateless
    mesh solvers)."""
    rs = split_factor * box_size / pm_grid
    r_cut = cut_factor * rs
    if pm_grid % n_dev:
        return None

    def cap_for(nc):
        if capacity > 0:
            return ((capacity + 127) // 128) * 128
        mean_occ = num_particles / max(nc ** 3, 1)
        c = int(math.ceil(occupancy_headroom * mean_occ))
        return max(128, ((c + 127) // 128) * 128)

    best = None
    d = n_dev
    while d <= pm_grid:
        if (d % n_dev == 0 and pm_grid % d == 0
                and box_size / d >= r_cut and d >= 3):
            cap = cap_for(d)
            cost = d ** 3 * 27 * cap * cap
            if best is None or cost < best[0]:
                best = (cost, d, cap)
        d += n_dev
    if best is None:
        return None
    _, ncell, cap = best
    return {"rs": rs, "r_cut": r_cut, "ncell": ncell, "capacity": cap,
            "margin": margin, "n_dev": n_dev}


# ---------------------------------------------------------------------------
# halo exchange helpers (inside shard_map)
# ---------------------------------------------------------------------------

def _ring(n_dev: int, shift: int):
    """ppermute permutation: device i sends to i+shift (mod n_dev)."""
    return [(i, (i + shift) % n_dev) for i in range(n_dev)]


def _halo_extend_x(blk, *, n_dev: int, axis_name: str):
    """[nx_l, ...] -> [nx_l+2, ...]: receive the right neighbor's first
    plane and the left neighbor's last plane."""
    from_left = jax.lax.ppermute(blk[-1:], axis_name, _ring(n_dev, +1))
    from_right = jax.lax.ppermute(blk[:1], axis_name, _ring(n_dev, -1))
    return jnp.concatenate([from_left, blk, from_right], axis=0)


def _unwrap_halo_positions(bp_ext, *, box_size, n_dev, axis_name):
    """Shift the x-coordinate of halo planes that crossed the periodic
    seam so pair separations are plain differences."""
    di = jax.lax.axis_index(axis_name)
    left_shift = jnp.where(di == 0, -box_size, 0.0)
    right_shift = jnp.where(di == n_dev - 1, box_size, 0.0)
    x = bp_ext[..., 0]
    x = x.at[0].add(left_shift)
    x = x.at[-1].add(right_shift)
    return bp_ext.at[..., 0].set(x)


# ---------------------------------------------------------------------------
# short-range on the halo-extended block
# ---------------------------------------------------------------------------

def _local_short_range(bp_ext, bm_ext, *, box_size, rs, softening,
                       nx_l: int, nc: int, cap: int):
    """27-stencil pairwise short-range for the inner nx_l cell planes of
    a halo-extended [nx_l+2, nc, nc, K] block. x-offsets are halo slices
    (positions pre-unwrapped), y/z-offsets periodic rolls. Same pair math
    as forces/treepm.short_range_bucketed."""
    soft2 = softening * softening
    acc = jnp.zeros((nx_l, nc, nc, cap, 3), bp_ext.dtype)
    center_p = bp_ext[1:1 + nx_l]

    for ox in (-1, 0, 1):
        xs_p = bp_ext[1 + ox:1 + ox + nx_l]
        xs_m = bm_ext[1 + ox:1 + ox + nx_l]
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                np_pos = jnp.roll(xs_p, shift=(-oy, -oz), axis=(1, 2))
                np_mass = jnp.roll(xs_m, shift=(-oy, -oz), axis=(1, 2))

                def slab(carry, xsl):
                    cp, nb_pos, nb_mass = xsl
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
# PM deposit / gather on local slabs
# ---------------------------------------------------------------------------

def _fold_x_open(a, *, ppc: int, ghost: int):
    """Non-periodic x-fold of [nx_l, ..., L(x-local), ...] blocks (axis 0
    = block x, axis 3 = local x): returns (slab [nx_l*ppc, ...] with
    interior overlaps resolved, lo_spill [ghost, ...], hi_spill
    [ghost, ...]) -- the spills belong to the x-neighbors."""
    # a: [nx_l, nc, nc, L, ppc?, ...] -- here a is [nx_l, L, ny, nz]
    # with local x at axis 1 after the caller's transpose.
    nx_l, ell = a.shape[0], a.shape[1]
    main = a[:, ghost:ghost + ppc]                      # [nx_l, ppc, ...]
    lo = a[:, 0:ghost]                                  # -> block-1 tail
    hi = a[:, ghost + ppc:ell]                          # -> block+1 head

    pad_lo = jnp.zeros_like(main)
    pad_lo = pad_lo.at[:, ppc - ghost:ppc].set(lo)
    main = main.at[:-1].add(pad_lo[1:])                 # interior
    lo_spill = lo[0]                                    # leaves the slab

    pad_hi = jnp.zeros_like(main)
    pad_hi = pad_hi.at[:, 0:ell - ghost - ppc].set(hi)
    main = main.at[1:].add(pad_hi[:-1])
    hi_spill = hi[-1]
    return (main.reshape((nx_l * ppc,) + a.shape[2:]),
            lo_spill, hi_spill)


def _local_deposit_slab(bpos, bmass, *, nc: int, nx_l: int, cap: int,
                        ng: int, box_size, margin: int, x0_cells,
                        n_dev: int, axis_name: str):
    """Bucketed one-hot CIC deposit of the local [Cl, K] cells into the
    device's [ng/D, ng, ng] grid slab; ghost spill planes ride one
    ppermute each way. x0_cells = first global cell plane of this slab
    (traced)."""
    ppc, ell = block_geometry(ng, nc, margin)
    ghost = margin + 1
    cl = nx_l * nc * nc

    # global block origins for local cells (x part is traced via x0)
    lx = jnp.arange(cl) // (nc * nc)
    cy = (jnp.arange(cl) // nc) % nc
    cz = jnp.arange(cl) % nc
    origins = jnp.stack([
        (x0_cells + lx) * ppc - ghost,
        cy * ppc - ghost,
        cz * ppc - ghost], axis=-1).astype(jnp.int32)

    x, y, zm, dropped = _cic_factors(bpos, bmass, origins, ng=ng,
                                     box_size=box_size, ell=ell)
    m1 = (x[:, :, :, None] * y[:, :, None, :]).reshape(cl, cap,
                                                       ell * ell)
    loc = jnp.einsum("cka,ckz->caz", m1, zm,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    loc = loc.reshape(nx_l, nc, nc, ell, ell, ell)

    # fold z, y periodically (full local extent), x openly with spills
    loc = _fold_axis(loc, 2, 5, c=nc, ppc=ppc, ghost=ghost)   # z
    loc = _fold_axis(loc, 1, 4, c=nc, ppc=ppc, ghost=ghost)   # y
    # -> [nx_l, nc, nc, L, ppc, ppc]; move to x-major slab layout
    a = loc.transpose(0, 3, 1, 4, 2, 5).reshape(
        nx_l, ell, nc * ppc, nc * ppc)
    slab, lo_spill, hi_spill = _fold_x_open(a, ppc=ppc, ghost=ghost)

    # ship spills: lo -> left neighbor's tail, hi -> right's head
    from_right = jax.lax.ppermute(lo_spill, axis_name, _ring(n_dev, -1))
    from_left = jax.lax.ppermute(hi_spill, axis_name, _ring(n_dev, +1))
    slab = slab.at[-ghost:].add(from_right)
    slab = slab.at[:ghost].add(from_left)
    return slab, dropped


def _extract_local_x(slab_ext, *, nx_l: int, nc: int, ppc: int,
                     ghost: int):
    """[ghost + nx_l*ppc + ghost, ng, ng] halo-extended field slab ->
    [nx_l (block x), L, ng, ng] overlapping x-windows (window for local
    plane lx starts at ext row lx*ppc). Requires 2*ghost <= ppc."""
    ell = ppc + 2 * ghost
    n_rows = nx_l * ppc
    # the strided a2 view needs ppc + n_rows rows; the ext slab has
    # n_rows + 2*ghost -- pad the tail (never read: a2 keeps only the
    # first 2*ghost rows of each ppc chunk)
    pad = ppc - 2 * ghost
    if pad > 0:
        slab_ext = jnp.concatenate(
            [slab_ext, jnp.zeros((pad,) + slab_ext.shape[1:],
                                 slab_ext.dtype)], axis=0)
    a1 = slab_ext[0:n_rows].reshape((nx_l, ppc) + slab_ext.shape[1:])
    a2 = slab_ext[ppc:ppc + n_rows].reshape(
        (nx_l, ppc) + slab_ext.shape[1:])
    return jnp.concatenate([a1, a2[:, :ell - ppc]], axis=1)


def _local_gather_fd4(phi_slab, bpos, *, nc: int, nx_l: int, cap: int,
                      ng: int, box_size, margin: int, x0_cells,
                      n_dev: int, axis_name: str):
    """fd4 gradient + CIC gather of the local phi slab at the local
    bucketed particles -> [Cl, K, 3]. Needs margin+3 halo planes in x
    (one ppermute each way); y/z gradients and windows wrap locally."""
    ppc, ell = block_geometry(ng, nc, margin)
    ghost = margin + 1
    h = box_size / ng
    cl = nx_l * nc * nc

    # fd4 halo: +-2 planes beyond the CIC ghost
    gh4 = ghost + 2
    left = jax.lax.ppermute(phi_slab[-gh4:], axis_name, _ring(n_dev, +1))
    right = jax.lax.ppermute(phi_slab[:gh4], axis_name, _ring(n_dev, -1))
    ext = jnp.concatenate([left, phi_slab, right], axis=0)

    # gradient fields on the extended slab (x via slicing, y/z via roll)
    def ddx(f):
        c = 1.0 / (12.0 * h)
        return (8.0 * (f[3:-1] - f[1:-3]) - (f[4:] - f[:-4])) * c

    def dd(f, axis):
        c = 1.0 / (12.0 * h)
        return (8.0 * (jnp.roll(f, -1, axis) - jnp.roll(f, 1, axis))
                - (jnp.roll(f, -2, axis) - jnp.roll(f, 2, axis))) * c

    fx = -ddx(ext)                       # [ghost+nx_l*ppc+ghost, ng, ng]
    fy = -dd(ext[2:-2], 1)
    fz = -dd(ext[2:-2], 2)

    # per-cell local windows: x via the open extraction, y/z periodic
    def windows(field):
        a = _extract_local_x(field, nx_l=nx_l, nc=nc, ppc=ppc,
                             ghost=ghost)                 # [nx_l,L,ng,ng]
        a = a.reshape(nx_l, ell, nc, ppc, nc, ppc).transpose(
            0, 2, 4, 1, 3, 5)                             # [nx_l,nc,nc,L,p,p]
        a = _unfold_axis(a, 1, 4, c=nc, ppc=ppc, ghost=ghost, ell=ell)
        a = _unfold_axis(a, 2, 5, c=nc, ppc=ppc, ghost=ghost, ell=ell)
        return a.reshape(cl, ell, ell, ell)

    fields = jnp.stack([windows(fx), windows(fy), windows(fz)], axis=1)

    lx = jnp.arange(cl) // (nc * nc)
    cy = (jnp.arange(cl) // nc) % nc
    cz = jnp.arange(cl) % nc
    origins = jnp.stack([
        (x0_cells + lx) * ppc - ghost,
        cy * ppc - ghost,
        cz * ppc - ghost], axis=-1).astype(jnp.int32)

    ones = jnp.ones((cl, cap), jnp.float32)
    x, y, z1, _ = _cic_factors(bpos, ones, origins, ng=ng,
                               box_size=box_size, ell=ell)
    t1 = jnp.einsum("cka,cfabz->ckfbz", x, fields,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    t2 = jnp.sum(t1 * y[:, :, None, :, None], axis=3)
    return jnp.sum(t2 * z1[:, :, None, :], axis=3)        # [Cl, K, 3]


# ---------------------------------------------------------------------------
# full force + step (shard_map over the device mesh)
# ---------------------------------------------------------------------------

def mesh_fast_accel(bpos, bmass, *, mesh: Mesh, box_size, ng: int,
                    ncell: int, capacity: int, margin: int, rs,
                    softening, g_const, axis_name: str = SHARD_AXIS):
    """Sharded TreePM accelerations for bucketed [C, K] state -> [C, K, 3]
    (+ dropped count). bpos/bmass shard along C (x-major cell ids)."""
    n_dev = mesh.shape[axis_name]
    nc = ncell
    nx_l = nc // n_dev
    ng_l = ng // n_dev
    cap = capacity
    green = _greens(ng, box_size, rs)           # [ng, ng//2+1] replicated
    cell_volume = (box_size / ng) ** 3

    def local(bp, bm, grn):
        di = jax.lax.axis_index(axis_name)
        x0_cells = (di * nx_l).astype(jnp.float32)
        blk_p = bp.reshape(nx_l, nc, nc, cap, 3)
        blk_m = bm.reshape(nx_l, nc, nc, cap)

        # --- short range: halo planes + 27-stencil
        bp_ext = _halo_extend_x(blk_p, n_dev=n_dev, axis_name=axis_name)
        bm_ext = _halo_extend_x(blk_m, n_dev=n_dev, axis_name=axis_name)
        bp_ext = _unwrap_halo_positions(bp_ext, box_size=box_size,
                                        n_dev=n_dev, axis_name=axis_name)
        acc_s = _local_short_range(
            bp_ext, bm_ext, box_size=box_size, rs=rs,
            softening=softening, nx_l=nx_l, nc=nc, cap=cap)

        # --- long range: local deposit -> distributed FFT Poisson ->
        #     local fd4 gather
        cl = nx_l * nc * nc
        slab, dropped = _local_deposit_slab(
            bp.reshape(cl, cap, 3), bm.reshape(cl, cap), nc=nc,
            nx_l=nx_l, cap=cap, ng=ng, box_size=box_size, margin=margin,
            x0_cells=x0_cells, n_dev=n_dev, axis_name=axis_name)
        phi_slab = _poisson_local(slab / cell_volume, grn, ng=ng,
                                  n_dev=n_dev, axis_name=axis_name)
        acc_l = _local_gather_fd4(
            phi_slab, bp.reshape(cl, cap, 3), nc=nc, nx_l=nx_l, cap=cap,
            ng=ng, box_size=box_size, margin=margin, x0_cells=x0_cells,
            n_dev=n_dev, axis_name=axis_name)

        acc = g_const * (acc_l.reshape(acc_s.shape) + acc_s)
        return (acc.reshape(cl, cap, 3),
                jax.lax.psum(dropped, axis_name)[None])

    acc, dropped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name)))(bpos, bmass, green)
    return acc, dropped[0]


def _poisson_local(slab, green, *, ng: int, n_dev: int, axis_name: str):
    """Slab-decomposed FFT Poisson solve, local view: the transpose-based
    distributed rfftn/irfftn of parallel/fft.py inlined for use inside an
    enclosing shard_map. slab [ng/D, ng, ng] -> phi slab [ng/D, ng, ng]."""
    ngl = slab.shape[0]
    nz = ng // 2 + 1

    gz = jnp.fft.rfft(slab, axis=2)                     # z first
    gy = jnp.fft.fft(gz, axis=1)                        # y local
    # transpose x <-> y: [D, ngl, ng/D, nz] chunks over y
    ch = gy.reshape(ngl, n_dev, ngl, nz).transpose(1, 0, 2, 3)
    rec = jax.lax.all_to_all(ch, axis_name, 0, 0, tiled=False)
    # rec[d] = x-chunk d of my y-slab: concatenate in DEVICE order
    gt = rec.reshape(ng, ngl, nz)                       # [x, y_loc, z]
    gk = jnp.fft.fft(gt, axis=0)                        # x now local

    # green arrives x-major [ng(x), ng(y), nz]: take our y chunk
    di = jax.lax.axis_index(axis_name)
    g_loc = jax.lax.dynamic_slice_in_dim(
        green, di * ngl, ngl, axis=1)                   # [ng, ngl, nz]
    pk = gk * g_loc

    pt = jnp.fft.ifft(pk, axis=0)                       # inverse x
    ch = pt.reshape(n_dev, ngl, ngl, nz)
    rec = jax.lax.all_to_all(ch, axis_name, 0, 0, tiled=False)
    py = rec.transpose(1, 0, 2, 3).reshape(ngl, ng, nz)
    py = jnp.fft.ifft(py, axis=1)
    return jnp.fft.irfft(py, n=ng, axis=2).real.astype(jnp.float32)


# ---------------------------------------------------------------------------
# sharded rebucket + migration
# ---------------------------------------------------------------------------

def mesh_rebucket(bpos, bvel, bmass, bids, bacc, *, mesh: Mesh, box_size,
                  ncell: int, capacity: int, mig_capacity: int = 0,
                  axis_name: str = SHARD_AXIS):
    """Re-bucket the sharded state locally and exchange emigrants with
    the +-x neighbor slabs (one ppermute each way, capacity-bounded,
    overflow counted). Returns new arrays + (overflow, migrated) counts."""
    n_dev = mesh.shape[axis_name]
    nc, cap = ncell, capacity
    nx_l = nc // n_dev
    cl = nx_l * nc * nc
    if mig_capacity <= 0:
        # drift <= 1 cell plane: emigrants live in the boundary planes;
        # size for a few boundary cells' worth each way
        mig_capacity = max(256, (nc * nc * cap) // 8)
    mig = mig_capacity

    def local(bp, bv, bm, bi, ba):
        di = jax.lax.axis_index(axis_name)
        x0 = di * nx_l
        pos = bp.reshape(-1, 3)
        vel = bv.reshape(-1, 3)
        mass = bm.reshape(-1)
        ids = bi.reshape(-1)
        acc = ba.reshape(-1, 3)

        cellx = jnp.clip(jnp.floor(pos[:, 0] / box_size * nc)
                         .astype(jnp.int32), 0, nc - 1)
        live = mass > 0
        # destination device (periodic): delta 0 = stay, 1 = right
        # neighbor, n_dev-1 = left neighbor; anything farther is a stray
        # (drift bound violated) -- counted, never silently lost
        delta = jnp.mod(cellx // nx_l - di, n_dev)
        stay = live & (delta == 0)
        go_right = live & (delta == 1)
        go_left = live & (delta == n_dev - 1) & ~go_right
        pre_strays = jnp.sum(live & ~stay & ~go_left & ~go_right)

        def pack(mask):
            rank = jnp.cumsum(mask) - 1
            slot = jnp.where(mask, rank, mig)
            buf_p = jnp.zeros((mig, 3)).at[slot].set(pos, mode="drop")
            buf_v = jnp.zeros((mig, 3)).at[slot].set(vel, mode="drop")
            buf_a = jnp.zeros((mig, 3)).at[slot].set(acc, mode="drop")
            buf_m = jnp.zeros((mig,)).at[slot].set(
                jnp.where(mask & (rank < mig), mass, 0.0), mode="drop")
            buf_i = jnp.full((mig,), -1, ids.dtype).at[slot].set(
                ids, mode="drop")
            lost = jnp.sum(mask & (rank >= mig))
            return (buf_p, buf_v, buf_a, buf_m, buf_i), lost

        lbuf, lost_l = pack(go_left)
        rbuf, lost_r = pack(go_right)
        recv_r = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, _ring(n_dev, -1)),
            lbuf)   # right neighbor's left-goers arrive here
        recv_l = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, _ring(n_dev, +1)),
            rbuf)

        pos_a = jnp.concatenate([pos, recv_l[0], recv_r[0]])
        vel_a = jnp.concatenate([vel, recv_l[1], recv_r[1]])
        acc_a = jnp.concatenate([acc, recv_l[2], recv_r[2]])
        mass_a = jnp.concatenate(
            [jnp.where(stay, mass, 0.0), recv_l[3], recv_r[3]])
        ids_a = jnp.concatenate([ids, recv_l[4], recv_r[4]])

        # local bucket: cid relative to the slab; out-of-slab -> dropped
        cell = jnp.clip(jnp.floor(pos_a / box_size * nc).astype(jnp.int32),
                        0, nc - 1)
        lxa = cell[:, 0] - x0
        in_slab = (lxa >= 0) & (lxa < nx_l)
        livea = (mass_a > 0)
        cid = jnp.where(livea & in_slab,
                        (lxa * nc + cell[:, 1]) * nc + cell[:, 2], cl)
        strays = jnp.sum(livea & ~in_slab)

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

        counts = jnp.stack([overflow + lost_l + lost_r + strays
                            + pre_strays,
                            jnp.sum(recv_l[3] > 0) + jnp.sum(
                                recv_r[3] > 0)])
        return nbp, nbv, nbm, nbi, nba, \
            jax.lax.psum(counts, axis_name)[None]

    nbp, nbv, nbm, nbi, nba, counts = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name),) * 5,
        out_specs=(P(axis_name),) * 5 + (P(axis_name),))(
            bpos, bvel, bmass, bids, bacc)
    return nbp, nbv, nbm, nbi, nba, counts[0, 0], counts[0, 1]


# ---------------------------------------------------------------------------
# public API: init / segment / run (mirrors ops/fast_treepm)
# ---------------------------------------------------------------------------

def initialize_mesh_fast(positions, velocities, masses, scale_factor, *,
                         mesh: Mesh, box_size, pm_grid, softening,
                         g_const=43.0071057317063, split_factor=1.25,
                         cut_factor=4.5, margin=1, capacity=0,
                         time=0.0, step=0, h0_internal=100.0,
                         kick_mode="reference", sf_method="rk4",
                         cosmological=True, axis_name: str = SHARD_AXIS,
                         plan_override=None, ids=None):
    """Bucket + shard + prime accelerations. Returns (FastState with
    C-sharded arrays, plan kwargs for mesh_fast_run), or raises if the
    geometry cannot be sharded (callers fall back to stateless mesh
    solvers). `plan_override`/`ids` let the engine rebuild at a grown
    capacity keeping geometry + particle identities (grow-and-retry)."""
    from ..forces.treepm import bucket_particles
    from ..ops.fast_treepm import FastState

    n_dev = mesh.shape[axis_name]
    plan = plan_override or mesh_fast_plan(
        positions.shape[0], float(box_size), pm_grid, n_dev,
        split_factor=split_factor, cut_factor=cut_factor,
        capacity=capacity, margin=margin)
    if plan is None:
        raise ValueError(
            f"mesh_fast_plan: box/pm_grid {pm_grid} cannot shard over "
            f"{n_dev} devices with cells >= r_cut")
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

    shard = NamedSharding(mesh, P(axis_name))
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

    acc, dropped = mesh_fast_accel(
        fstate.bpos, fstate.bmass, mesh=mesh, box_size=kw["box_size"],
        ng=pm_grid, ncell=nc, capacity=cap, margin=kw["margin"],
        rs=kw["rs"], softening=kw["softening"], g_const=kw["g_const"],
        axis_name=axis_name)
    fstate = fstate.replace(acc=acc,
                            dropped=fstate.dropped
                            + dropped.astype(jnp.int32))
    return fstate, kw


@partial(jax.jit, static_argnames=(
    "mesh", "axis_name", "box_size", "ng", "ncell", "capacity", "margin",
    "rs", "softening", "g_const", "h0_internal", "kick_mode", "sf_method",
    "cosmological", "n_steps"))
def _mesh_fast_segment(fstate, params, dt, *, mesh, axis_name, box_size,
                       ng, ncell, capacity, margin, rs, softening,
                       g_const, h0_internal=100.0, kick_mode="reference",
                       sf_method="rk4", cosmological=True, n_steps=1):
    """`n_steps` fused KDK steps on the sharded bucketed state."""
    from ..physics.integrators import (drift_factor, kick_factor,
                                       update_scale_factor, wrap_positions)

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
        acc_new, dropped = mesh_fast_accel(
            fs.bpos, fs.bmass, mesh=mesh, box_size=box_size, ng=ng,
            ncell=ncell, capacity=capacity, margin=margin, rs=rs,
            softening=softening, g_const=g_const, axis_name=axis_name)
        vel = fs.bvel + acc_new * (0.5 * dt) * kick_factor(a1, kick_mode)
        return fs.replace(bvel=vel, acc=acc_new,
                          dropped=fs.dropped
                          + dropped.astype(jnp.int32)), None

    fstate, _ = jax.lax.scan(one_step, fstate, None, length=n_steps)
    return fstate


def mesh_fast_run(fstate, params, dt, *, mesh: Mesh, rebucket_every=16,
                  n_steps=1, axis_name: str = SHARD_AXIS,
                  steps_since_rebucket: int = 0, on_overflow="count",
                  **kw):
    """Advance n_steps with re-bucketing + migration between segments.
    `steps_since_rebucket` carries the cadence across chunked calls
    (see ops/fast_treepm.fast_run). `on_overflow="raise"` throws
    BucketOverflowError with the INTACT pre-rebucket state when a
    rebucket would lose particles, so callers can grow capacity and
    retry losslessly (the engine's grow-and-retry)."""
    remaining = n_steps
    since = max(0, int(steps_since_rebucket))
    while remaining > 0:
        if since >= rebucket_every:
            nbp, nbv, nbm, nbi, nba, ovf, _ = mesh_rebucket(
                fstate.bpos, fstate.bvel, fstate.bmass, fstate.ids,
                fstate.acc, mesh=mesh, box_size=kw["box_size"],
                ncell=kw["ncell"], capacity=kw["capacity"],
                axis_name=axis_name)
            if on_overflow == "raise" and int(ovf) > 0:
                from ..ops.fast_treepm import BucketOverflowError
                raise BucketOverflowError(fstate,
                                          n_steps - remaining)
            fstate = fstate.replace(
                bpos=nbp, bvel=nbv, bmass=nbm, ids=nbi, acc=nba,
                overflow=fstate.overflow + ovf.astype(jnp.int32))
            since = 0
        seg = min(rebucket_every - since, remaining)
        fstate = _mesh_fast_segment(fstate, params, dt, mesh=mesh,
                                    axis_name=axis_name, n_steps=seg,
                                    **kw)
        remaining -= seg
        since += seg
    return fstate
