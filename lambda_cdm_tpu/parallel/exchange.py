"""Capacity-bounded particle migration + ghost-zone exchange over ICI.

TPU-native rebuild of the reference's MPI particle plumbing:
  * `migrate_particles`  <- ClusterCommunicator::exchange_particles
    (ownership test -> per-rank export lists -> MPI_Alltoall counts ->
    MPI_Alltoallv bytes, src/mpi/cluster_comm.cpp:90-164)
  * `exchange_ghosts`    <- exchange_ghost_particles (expanded-box ghost
    predicate -> MPI_Sendrecv per neighbor, cluster_comm.cpp:166-206)
  * `find_owner`         <- find_owner_rank (cluster_comm.cpp:280-312)

TPU collectives need static shapes, so variable-length Alltoallv becomes
fixed-capacity bucket exchange with masking (SURVEY.md section 5): each
device fills a [n_dev, capacity] send buffer (zero-mass padding), one
`all_to_all` moves buckets, and overflow is *counted and reported*, never
silently dropped -- callers grow capacity and retry (the engine sizes
capacity with compute.mesh.migrate_capacity_factor headroom).

Ownership is a 1D x-slab decomposition: device d owns x in
[d, d+1) * box/n_dev, matching the mesh/grid slab sharding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS, axis_size as _axis_size


def pad_particles(positions, velocities, masses, *, n_dev: int,
                  factor: float = 1.5):
    """Over-allocate local rows so slab occupancy can fluctuate without
    migration overflow: returns arrays with
    N_alloc = ceil(factor * N / n_dev) * n_dev rows, zero-mass padding
    (compute.mesh.migrate_capacity_factor headroom knob). Padding rows are
    inert everywhere: zero mass -> zero force contribution, excluded from
    diagnostics and exchanges."""
    n = positions.shape[0]
    import math
    n_alloc = int(math.ceil(factor * n / n_dev)) * n_dev
    pad = n_alloc - n
    if pad == 0:
        return positions, velocities, masses
    return (jnp.pad(positions, ((0, pad), (0, 0))),
            jnp.pad(velocities, ((0, pad), (0, 0))),
            jnp.pad(masses, (0, pad)))


def find_owner(positions, box_size, n_dev: int, bounds=None):
    """Owning device id per particle: uniform x-slabs, or adaptive slab
    `bounds` [n_dev+1] (cf. find_owner_rank, cluster_comm.cpp:280-312)."""
    if bounds is None:
        d = jnp.floor(positions[:, 0] / box_size * n_dev).astype(jnp.int32)
        return jnp.clip(d, 0, n_dev - 1)
    d = jnp.searchsorted(bounds[1:-1], positions[:, 0], side="right")
    return jnp.clip(d.astype(jnp.int32), 0, n_dev - 1)


def find_owner_3d(positions, box_size, dims: tuple[int, int, int],
                  bounds=None):
    """Owning flat device id for a 3D block decomposition: device (i,j,k)
    of a row-major (dx, dy, dz) mesh owns the box block
    [i,i+1)x[j,j+1)x[k,k+1) * box/dims. Matches make_mesh3d's device
    order (and lax.axis_index over the 3-axis tuple).

    With `bounds` = (bx [dx+1], by [dx, dy+1], bz [dx, dy, dz+1]) from
    adaptive_bounds_nd, blocks are the hierarchical non-uniform bricks
    instead (x planes, then per-x-slab y planes, then per-(x,y)-block z
    planes) -- the load-adaptive analogue of the reference's Morton
    greedy cell assignment (domain_decomposition.cpp:114-264)."""
    if bounds is None:
        ids = []
        for a in range(3):
            d = jnp.floor(positions[:, a] / box_size * dims[a]).astype(
                jnp.int32)
            ids.append(jnp.clip(d, 0, dims[a] - 1))
        return (ids[0] * dims[1] + ids[1]) * dims[2] + ids[2]
    bx, by, bz = bounds
    ix = jnp.clip(jnp.searchsorted(bx[1:-1], positions[:, 0],
                                   side="right").astype(jnp.int32),
                  0, dims[0] - 1)
    byr = by[ix]                                   # [n, dy+1]
    iy = jnp.sum(positions[:, 1][:, None] >= byr[:, 1:-1],
                 axis=1).astype(jnp.int32)
    iy = jnp.clip(iy, 0, dims[1] - 1)
    bzr = bz[ix, iy]                               # [n, dz+1]
    iz = jnp.sum(positions[:, 2][:, None] >= bzr[:, 1:-1],
                 axis=1).astype(jnp.int32)
    iz = jnp.clip(iz, 0, dims[2] - 1)
    return (ix * dims[1] + iy) * dims[2] + iz


def pair_cost_weights(positions, masses, box_size, *, ncell: int = 0):
    """Per-particle short-range COST weights: the occupancy of each
    particle's cell on an ncell^3 counting grid, so a region's summed
    weight ~ sum_cells occ^2 -- the pairwise-kernel work it will
    actually do. Count-balanced partitions can be pair-overloaded on
    clustered data (a rank holding one dense clump does O(occ^2) work);
    this is the measured-compute-time balancing of the reference's
    LoadBalancer (cluster_comm.cpp:314-349) expressed as its
    density-squared proxy, computable in one histogram + one gather
    instead of a timing feedback loop. ncell=0 auto-sizes to ~4
    particles per cell (clamped to [8, 64]); pass the solver's actual
    short-range ncell when known. Dead rows weigh zero."""
    n = positions.shape[0]
    if ncell <= 0:
        ncell = int(min(64, max(8, round((n / 4.0) ** (1.0 / 3.0)))))
    live = masses > 0
    cell = jnp.clip((positions / box_size * ncell).astype(jnp.int32),
                    0, ncell - 1)
    cidx = (cell[:, 0] * ncell + cell[:, 1]) * ncell + cell[:, 2]
    occ = jax.ops.segment_sum(jnp.where(live, 1.0, 0.0), cidx,
                              num_segments=ncell ** 3)
    return jnp.where(live, occ[cidx], 0.0)


def adaptive_slab_bounds(positions, masses, n_dev: int, box_size, *,
                         resolution: int = 512, weights=None):
    """Equal-load slab boundaries from the particle x-distribution
    (the reference's LoadBalancer::rebalance + adaptive decomposition,
    cluster_comm.cpp:330-349 / domain_decomposition.cpp:114-264, reduced
    to the 1D slab topology). Returns bounds [n_dev+1] with
    bounds[0] = 0 and bounds[-1] = box_size. `weights` switches the
    balanced quantity from live counts to per-particle costs
    (pair_cost_weights)."""
    live = masses > 0
    w = jnp.where(live, 1.0, 0.0) if weights is None \
        else jnp.where(live, weights, 0.0)
    xbin = jnp.clip((positions[:, 0] / box_size * resolution).astype(
        jnp.int32), 0, resolution - 1)
    hist = jax.ops.segment_sum(w, xbin, num_segments=resolution)
    cum = jnp.cumsum(hist)
    total = cum[-1]
    targets = total * jnp.arange(1, n_dev) / n_dev
    # boundary bin for each internal cut
    cuts = jnp.searchsorted(cum, targets, side="left").astype(jnp.float32)
    inner = (cuts + 1.0) * (box_size / resolution)
    return jnp.concatenate([jnp.zeros((1,)), inner,
                            jnp.full((1,), box_size)])


@partial(jax.jit, static_argnames=("dims", "box_size", "resolution"))
def adaptive_bounds_nd(positions, masses, dims: tuple[int, int, int],
                       box_size, *, resolution: int = 256, weights=None):
    """Hierarchical equal-load brick bounds for a (dx, dy, dz) block mesh.

    Recursive conditional splits -- x planes from the x marginal, then
    per-x-slab y planes, then per-(x,y)-block z planes -- so arbitrary
    3D clustering (not just product distributions) balances, the same
    capability as the reference's Morton-greedy cell-to-rank assignment
    (domain_decomposition.cpp:114-264). Returns (bx [dx+1],
    by [dx, dy+1], bz [dx, dy, dz+1]) consumed by find_owner_3d.
    `weights` switches the balanced quantity from live counts to
    per-particle costs (pair_cost_weights): count-equal bricks can be
    pair-overloaded on clustered data.
    """
    dx, dy, dz = dims
    live = masses > 0
    w = jnp.where(live, 1.0, 0.0) if weights is None \
        else jnp.where(live, weights, 0.0)
    R = resolution
    step = box_size / R

    def axbin(a):
        return jnp.clip((positions[:, a] / box_size * R).astype(
            jnp.int32), 0, R - 1)

    def equal_cuts(hist, n_parts):
        """hist [..., R] -> bounds [..., n_parts+1] splitting each row's
        mass into n_parts near-equal contiguous chunks, with linear
        interpolation inside the boundary bin (a whole-bin cut can
        misassign an entire peak bin on tightly clustered data)."""
        cum = jnp.cumsum(hist, axis=-1)
        total = cum[..., -1:]
        targets = total * (jnp.arange(1, n_parts) / n_parts)
        cnt = jnp.sum(cum[..., None, :] < targets[..., :, None],
                      axis=-1)                          # [..., n_parts-1]
        cum_pad = jnp.concatenate(
            [jnp.zeros(hist.shape[:-1] + (1,)), cum], axis=-1)
        before = jnp.take_along_axis(cum_pad, cnt, axis=-1)
        h = jnp.take_along_axis(hist, jnp.minimum(cnt, R - 1), axis=-1)
        frac = jnp.clip((targets - before) / jnp.maximum(h, 1e-30),
                        0.0, 1.0)
        inner = (cnt.astype(jnp.float32) + frac) * step
        shape = hist.shape[:-1]
        return jnp.concatenate(
            [jnp.zeros(shape + (1,)), inner,
             jnp.full(shape + (1,), box_size)], axis=-1)

    xb, yb, zb = axbin(0), axbin(1), axbin(2)
    bx = equal_cuts(jax.ops.segment_sum(w, xb, num_segments=R), dx)

    ix = jnp.clip(jnp.searchsorted(bx[1:-1], positions[:, 0],
                                   side="right").astype(jnp.int32),
                  0, dx - 1)
    hy = jax.ops.segment_sum(w, ix * R + yb,
                             num_segments=dx * R).reshape(dx, R)
    by = equal_cuts(hy, dy)

    byr = by[ix]
    iy = jnp.clip(jnp.sum(positions[:, 1][:, None] >= byr[:, 1:-1],
                          axis=1).astype(jnp.int32), 0, dy - 1)
    hz = jax.ops.segment_sum(w, (ix * dy + iy) * R + zb,
                             num_segments=dx * dy * R).reshape(dx, dy, R)
    bz = equal_cuts(hz, dz)
    return bx, by, bz




def _owner_of(pos, mass, box_size, mesh, axis_name, bounds, my_id):
    """Owner per particle: 1D slabs (str axis) or 3D blocks (3-tuple
    axis, row-major device order). Dead rows stay home. `bounds` selects
    adaptive partitions: [n_dev+1] slab planes (1D) or the
    adaptive_bounds_nd (bx, by, bz) brick tuple (3D)."""
    if isinstance(axis_name, tuple):
        dims = tuple(mesh.shape[a] for a in axis_name)
        owner = find_owner_3d(pos, box_size, dims, bounds=bounds)
    else:
        owner = find_owner(pos, box_size, _axis_size(mesh, axis_name),
                           bounds=bounds)
    return jnp.where(mass > 0, owner, my_id)


def _bucket_by_owner(pos, vel, mass, owner, my_id, n_dev, capacity):
    """Fill [n_dev, capacity] send buffers from local arrays.

    Slot assignment via rank-within-destination (sort-free: cumsum of
    one-hot). Overflow slots (rank >= capacity) are counted.
    """
    n = pos.shape[0]
    onehot = (owner[:, None] == jnp.arange(n_dev)[None, :]).astype(jnp.int32)
    rank = jnp.cumsum(onehot, axis=0) - 1          # [n, n_dev]
    my_rank = jnp.take_along_axis(rank, owner[:, None], axis=1)[:, 0]
    ok = my_rank < capacity
    slot = jnp.where(ok, owner * capacity + my_rank, n_dev * capacity)

    def scatter(buf, vals):
        return buf.at[slot].set(vals, mode="drop")

    bpos = scatter(jnp.zeros((n_dev * capacity, 3), pos.dtype), pos)
    bvel = scatter(jnp.zeros((n_dev * capacity, 3), vel.dtype), vel)
    bmass = scatter(jnp.zeros((n_dev * capacity,), mass.dtype),
                    jnp.where(ok, mass, 0.0))
    overflow = jnp.sum(~ok & (mass > 0))
    return (bpos.reshape(n_dev, capacity, 3),
            bvel.reshape(n_dev, capacity, 3),
            bmass.reshape(n_dev, capacity), overflow)


@partial(jax.jit, static_argnames=("capacity", "mesh", "axis_name",
                                   "box_size"))
def migrate_particles(positions, velocities, masses, *, box_size,
                      capacity: int, mesh: Mesh,
                      axis_name: str = SHARD_AXIS, bounds=None):
    """Re-home particles to their owning x-slab device.

    Inputs are [N, ...] sharded along N (N/n_dev local rows per device,
    zero-mass rows = empty slots). Returns (positions, velocities, masses,
    overflow_total) with the same static shapes: each device's local rows
    afterwards hold ONLY particles it owns (zero-mass padding elsewhere).
    Local capacity per device is n_loc = N/n_dev; `capacity` bounds the
    per-(source, destination) bucket. NOTE: once particles are homed, a
    subsequent migration routes nearly all live local rows into the
    self-destination bucket, so steady-state callers must use
    capacity >= n_loc (the engine does); smaller capacities only suit
    first-time scatter from shuffled input.
    """
    n_dev = _axis_size(mesh, axis_name)

    def local(pos, vel, mass, bnd):
        my_id = jax.lax.axis_index(axis_name)
        owner = _owner_of(pos, mass, box_size, mesh, axis_name,
                          None if bnd is None else bnd, my_id)
        bpos, bvel, bmass, ovf = _bucket_by_owner(
            pos, vel, mass, owner, my_id, n_dev, capacity)

        # all_to_all: dim 0 is the destination-device dim
        rpos = jax.lax.all_to_all(bpos, axis_name, 0, 0, tiled=False)
        rvel = jax.lax.all_to_all(bvel, axis_name, 0, 0, tiled=False)
        rmass = jax.lax.all_to_all(bmass, axis_name, 0, 0, tiled=False)
        # received: [n_dev, capacity, ...] -> compact into local rows
        rpos = rpos.reshape(n_dev * capacity, 3)
        rvel = rvel.reshape(n_dev * capacity, 3)
        rmass = rmass.reshape(n_dev * capacity)

        n_loc = pos.shape[0]
        # stable compaction of nonempty received slots into n_loc rows
        filled = rmass > 0
        order = jnp.argsort(~filled, stable=True)   # nonempty first
        take = order[:n_loc]
        out_pos = jnp.where(filled[take][:, None], rpos[take], 0.0)
        out_vel = jnp.where(filled[take][:, None], rvel[take], 0.0)
        out_mass = jnp.where(filled[take], rmass[take], 0.0)
        # particles beyond n_loc local rows are overflow too
        recv_overflow = jnp.maximum(jnp.sum(filled) - n_loc, 0)
        total_ovf = jax.lax.psum(ovf + recv_overflow, axis_name)
        return out_pos, out_vel, out_mass, total_ovf

    if bounds is None:
        def local2(pos, vel, mass):
            return local(pos, vel, mass, None)
        out = jax.shard_map(
            local2, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P(axis_name), P()))(
                positions, velocities, masses)
    else:
        out = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
            out_specs=(P(axis_name), P(axis_name), P(axis_name), P()))(
                positions, velocities, masses, bounds)
    return out


@partial(jax.jit, static_argnames=("capacity", "mesh", "axis_name",
                                   "box_size"))
def migrate_particles_emigrant(positions, velocities, masses, *, box_size,
                               capacity: int, mesh: Mesh,
                               axis_name: str = SHARD_AXIS, bounds=None):
    """Emigrant-only migration: the scalable steady-state exchange.

    Unlike `migrate_particles` (whose self-bucket must hold every stayer,
    forcing capacity >= n_loc and O(N)-row send buffers per device), only
    rows whose owner CHANGED enter the all_to_all; stayers never move.
    `capacity` bounds the per-(source, destination) bucket and can be a
    few % of n_loc in steady state -- the analogue of the reference's
    true Alltoallv which also ships only movers (cluster_comm.cpp:90-164).

    Semantics: sent rows are cleared at the source and immigrants fill
    free (zero-mass) local slots. On ANY overflow (send bucket full, or
    too few free slots to absorb arrivals) the result is INVALID —
    callers must discard the returned arrays and retry from the original
    state with a larger capacity (the engine does, doubling); applying an
    overflowed result would lose particles.

    Returns (positions, velocities, masses, overflow_total).
    """
    n_dev = _axis_size(mesh, axis_name)
    buf = n_dev * capacity

    def local(pos, vel, mass, bnd):
        my_id = jax.lax.axis_index(axis_name)
        live = mass > 0
        owner = _owner_of(pos, mass, box_size, mesh, axis_name,
                          None if bnd is None else bnd, my_id)
        emig = live & (owner != my_id)

        onehot = (emig[:, None]
                  & (owner[:, None] == jnp.arange(n_dev)[None, :]))
        rank = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
        my_rank = jnp.take_along_axis(rank, owner[:, None], axis=1)[:, 0]
        ok = emig & (my_rank < capacity)
        slot = jnp.where(ok, owner * capacity + my_rank, buf)

        bpos = jnp.zeros((buf, 3), pos.dtype).at[slot].set(
            jnp.where(ok[:, None], pos, 0.0), mode="drop")
        bvel = jnp.zeros((buf, 3), vel.dtype).at[slot].set(
            jnp.where(ok[:, None], vel, 0.0), mode="drop")
        bmass = jnp.zeros((buf,), mass.dtype).at[slot].set(
            jnp.where(ok, mass, 0.0), mode="drop")
        send_ovf = jnp.sum(emig & ~ok)

        rpos = jax.lax.all_to_all(bpos.reshape(n_dev, capacity, 3),
                                  axis_name, 0, 0).reshape(buf, 3)
        rvel = jax.lax.all_to_all(bvel.reshape(n_dev, capacity, 3),
                                  axis_name, 0, 0).reshape(buf, 3)
        rmass = jax.lax.all_to_all(bmass.reshape(n_dev, capacity),
                                   axis_name, 0, 0).reshape(buf)

        # compact immigrants (nonempty first, stable)
        filled = rmass > 0
        order = jnp.argsort(~filled, stable=True)
        imm_pos, imm_vel, imm_mass = rpos[order], rvel[order], rmass[order]
        n_imm = jnp.sum(filled)

        # sent rows become free slots; fill free slots with immigrants
        keep_mass = jnp.where(ok, 0.0, mass)
        free = keep_mass == 0
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        idx = jnp.clip(free_rank, 0, buf - 1)
        valid = free & (free_rank < buf)
        cand_mass = jnp.where(valid, imm_mass[idx], 0.0)
        place = free & (cand_mass > 0)
        out_mass = jnp.where(free, cand_mass, mass)
        out_pos = jnp.where(place[:, None], imm_pos[idx],
                            jnp.where(ok[:, None] | ~live[:, None],
                                      0.0, pos))
        out_vel = jnp.where(place[:, None], imm_vel[idx],
                            jnp.where(ok[:, None] | ~live[:, None],
                                      0.0, vel))
        recv_ovf = jnp.maximum(n_imm - jnp.sum(free), 0)
        total_ovf = jax.lax.psum(send_ovf + recv_ovf, axis_name)
        return out_pos, out_vel, out_mass, total_ovf

    if bounds is None:
        def local2(pos, vel, mass):
            return local(pos, vel, mass, None)
        return jax.shard_map(
            local2, mesh=mesh,
            in_specs=(P(axis_name), P(axis_name), P(axis_name)),
            out_specs=(P(axis_name), P(axis_name), P(axis_name), P()))(
                positions, velocities, masses)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P()))(
            positions, velocities, masses, bounds)


@partial(jax.jit, static_argnames=("capacity", "mesh", "axis_name",
                                   "box_size", "ghost_width"))
def exchange_ghosts(positions, masses, *, box_size, ghost_width: float,
                    capacity: int, mesh: Mesh,
                    axis_name: str = SHARD_AXIS):
    """Gather ghost particles from the +/-x neighbor slabs.

    Each device receives copies of neighbor particles within `ghost_width`
    of its slab faces (periodic wrap), as fixed-capacity padded buffers:
    returns (ghost_pos [2*capacity, 3], ghost_mass [2*capacity],
    overflow_total). cf. exchange_ghost_particles,
    cluster_comm.cpp:166-206 (width 0.1 default there).
    """
    n_dev = mesh.shape[axis_name]
    slab = box_size / n_dev

    def local(pos, mass):
        my_id = jax.lax.axis_index(axis_name)
        lo = my_id * slab
        hi = lo + slab
        # candidates for my right neighbor: x in [hi - w, hi)
        send_right = (pos[:, 0] >= hi - ghost_width) & (mass > 0)
        # candidates for my left neighbor: x in [lo, lo + w)
        send_left = (pos[:, 0] < lo + ghost_width) & (mass > 0)

        def pack(sel):
            rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
            ok = sel & (rank < capacity)
            slot = jnp.where(ok, rank, capacity)
            bpos = jnp.zeros((capacity + 1, 3), pos.dtype
                             ).at[slot].set(jnp.where(ok[:, None], pos, 0.0),
                                            mode="drop")[:capacity]
            bm = jnp.zeros((capacity + 1,), mass.dtype
                           ).at[slot].set(jnp.where(ok, mass, 0.0),
                                          mode="drop")[:capacity]
            ovf = jnp.sum(sel & ~ok)
            return bpos, bm, ovf

        rp, rm, ovf_r = pack(send_right)
        lp, lm, ovf_l = pack(send_left)

        fwd = [(s, (s + 1) % n_dev) for s in range(n_dev)]
        bwd = [(s, (s - 1) % n_dev) for s in range(n_dev)]
        # what I send right arrives as the left-ghosts of my right neighbor
        from_left_pos = jax.lax.ppermute(rp, axis_name, fwd)
        from_left_m = jax.lax.ppermute(rm, axis_name, fwd)
        from_right_pos = jax.lax.ppermute(lp, axis_name, bwd)
        from_right_m = jax.lax.ppermute(lm, axis_name, bwd)

        gpos = jnp.concatenate([from_left_pos, from_right_pos], axis=0)
        gmass = jnp.concatenate([from_left_m, from_right_m], axis=0)
        total_ovf = jax.lax.psum(ovf_r + ovf_l, axis_name)
        return gpos, gmass, total_ovf

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()))(positions, masses)


def load_imbalance(masses, *, mesh: Mesh, axis_name: str = SHARD_AXIS,
                   weights=None):
    """(max-min)/max of per-device live-particle counts -- the reference's
    rebalance trigger (LoadBalancer::needs_rebalancing > 0.2 spread,
    cluster_comm.cpp:314-349). With `weights` (pair_cost_weights) the
    spread is measured in estimated pairwise-compute cost instead of
    counts."""
    def local(mass, w):
        count = jnp.sum(jnp.where(mass > 0, w, 0.0))
        cmax = jax.lax.pmax(count, axis_name)
        cmin = jax.lax.pmin(count, axis_name)
        return (cmax - cmin) / jnp.maximum(cmax, 1.0)

    if weights is None:
        weights = jnp.ones_like(masses)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(axis_name), P(axis_name)),
                         out_specs=P())(masses, weights)
