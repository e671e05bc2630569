"""Friends-of-friends halo finder + spherical-overdensity refinement,
fully on-device.

TPU-native rebuild of the reference's halo finding
(src/analysis/halo_finder.cpp:15-444): the grid-accelerated union-find
becomes iterative minimum-label propagation over a 27-cell stencil with
pointer jumping -- a data-parallel connected-components algorithm that
converges in O(log N) rounds under `lax.while_loop` (static shapes, no
recursion), exactly the structure SURVEY.md section 7 M3 prescribes.

Outputs mirror the reference's Halo struct (include/analysis/halo_finder.hpp:
10-22): center of mass, mean velocity, total mass, virial radius
(overdensity Delta=200), maximum circular velocity, particle count,
angular momentum, spin parameter -- computed with segment reductions
(halo_finder.cpp:234-337 parity).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..forces.direct import min_image
from ..forces.treepm import bucket_particles


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HaloCatalog:
    """Fixed-capacity halo catalog (top `max_halos` by particle count).

    Mirrors reference Halo fields (halo_finder.hpp:10-22). Slots beyond
    `num_halos` are zero-padded.
    """
    num_halos: jax.Array          # [] int32
    n_particles: jax.Array        # [H] int32
    center: jax.Array             # [H, 3] center of mass
    velocity: jax.Array           # [H, 3] CoM velocity
    mass: jax.Array               # [H]
    radius: jax.Array             # [H] R_Delta (SO radius)
    v_max: jax.Array              # [H] max circular velocity
    angular_momentum: jax.Array   # [H, 3]
    spin: jax.Array               # [H] Peebles spin parameter
    particle_label: jax.Array     # [N] halo id per particle (-1 = field)


# ---------------------------------------------------------------------------
# FoF via label propagation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ncell", "capacity", "max_rounds"))
def fof_labels(positions, box_size, linking_length, *, ncell: int,
               capacity: int, max_rounds: int = 64):
    """Connected components under the FoF relation |xi - xj| < b.

    Returns (label [N] int32 = root particle index per group, overflow).
    Algorithm: bucket particles into cells of size >= b; repeat
    { hook: label_i <- min over 27-stencil neighbors within b;
      compress: label <- label[label] (pointer jumping) } until fixpoint.
    """
    n = positions.shape[0]
    masses = jnp.ones((n,), jnp.float32)
    bpos, bmass, pslot, overflow = bucket_particles(
        positions, masses, box_size, ncell=ncell, capacity=capacity)
    ncells = ncell ** 3
    k = capacity
    occupied = bmass > 0                      # [C, K]

    # label per slot = own flat slot index where occupied, else huge
    flat_ids = jnp.arange(ncells * k, dtype=jnp.int32).reshape(ncells, k)
    big = jnp.int32(ncells * k)
    label0 = jnp.where(occupied, flat_ids, big)

    bp = bpos.reshape(ncell, ncell, ncell, k, 3)
    occ = occupied.reshape(ncell, ncell, ncell, k)
    b2 = linking_length * linking_length

    neighbor_shifts = [(ox, oy, oz)
                       for ox in (-1, 0, 1)
                       for oy in (-1, 0, 1)
                       for oz in (-1, 0, 1)]

    def hook(lab):
        """One min-label sweep over the 27-stencil, scanned over cell
        ROWS so the pair temporaries are [nc, K, K] (a full-lattice
        [nc^3, K, K, 3] tensor is ~0.5 TB at production ncell/K -- the
        round-2 memory blowup)."""
        lab3 = lab.reshape(ncell, ncell, ncell, k)
        rows = ncell * ncell
        bp_r = bp.reshape(rows, ncell, k, 3)
        occ_r = occ.reshape(rows, ncell, k)
        new = lab3
        for (ox, oy, oz) in neighbor_shifts:
            nb_pos = jnp.roll(bp, (-ox, -oy, -oz), axis=(0, 1, 2)) \
                .reshape(rows, ncell, k, 3)
            nb_lab = jnp.roll(lab3, (-ox, -oy, -oz), axis=(0, 1, 2)) \
                .reshape(rows, ncell, k)
            nb_occ = jnp.roll(occ, (-ox, -oy, -oz), axis=(0, 1, 2)) \
                .reshape(rows, ncell, k)
            cur = new.reshape(rows, ncell, k)

            def row(carry, xs):
                cp, co, cl, npos, nlab, nocc = xs      # [nc(z), K, ...]
                r2 = jnp.zeros((ncell, k, k), jnp.float32)
                for c in range(3):
                    d = min_image(npos[:, None, :, c]
                                  - cp[:, :, None, c], box_size)
                    r2 += d * d
                linked = (r2 < b2) & nocc[:, None, :] & co[:, :, None]
                cand = jnp.where(linked, nlab[:, None, :], big)
                return carry, jnp.minimum(cl, jnp.min(cand, axis=-1))

            _, upd = jax.lax.scan(
                row, None, (bp_r, occ_r, cur, nb_pos, nb_lab, nb_occ))
            new = upd.reshape(ncell, ncell, ncell, k)
        return new.reshape(ncells, k)

    def compress_full(lab):
        """Pointer-jump to convergence (cheap gathers; full compression
        between stencil hooks minimizes the expensive hook rounds)."""
        def one(lab_flat):
            safe = jnp.minimum(lab_flat, big - 1)
            return jnp.where(lab_flat < big, lab_flat[safe], big)

        def cond(st):
            lab_flat, prev, i = st
            return (i < 16) & jnp.any(lab_flat != prev)

        def body(st):
            lab_flat, _, i = st
            return one(lab_flat), lab_flat, i + 1

        flat = lab.ravel()
        flat, _, _ = jax.lax.while_loop(cond, body,
                                        (one(flat), flat, jnp.int32(0)))
        return flat.reshape(ncells, k)

    def cond(state):
        lab, prev, i = state
        return (i < max_rounds) & jnp.any(lab != prev)

    def body(state):
        lab, _, i = state
        new = compress_full(hook(lab))
        return new, lab, i + 1

    lab = compress_full(hook(label0))
    lab, _, rounds = jax.lax.while_loop(
        cond, body, (lab, label0, jnp.int32(0)))

    # slot labels -> per original particle. Capacity-overflow particles
    # (dense halo-core cells, occupancy > capacity) merge into their own
    # cell's group via the cell's slot-0 anchor: a cell that overflows a
    # sane capacity is orders of magnitude above the linking density, so
    # standard FoF would link its contents anyway -- the approximation
    # is COUNTED (`overflow`), bounding memory at [ncell^3, capacity]
    # instead of sizing every cell for the densest core (the round-2
    # known gap: clustered 1e6+ fields blew up the padded layout).
    flat_lab = lab.ravel()
    safe_slot = jnp.maximum(pslot, 0)
    cell = jnp.clip(jnp.floor(positions / box_size * ncell).astype(
        jnp.int32), 0, ncell - 1)
    cid = (cell[:, 0] * ncell + cell[:, 1]) * ncell + cell[:, 2]
    anchor = flat_lab[cid * k]               # own cell's slot-0 label
    plabel = jnp.where(pslot >= 0, flat_lab[safe_slot], anchor)
    # canonicalize: map slot-space roots to particle-space roots
    # root slot -> the first particle owning it: build inverse map
    inv = jnp.full((ncells * k + 1,), n, jnp.int32)
    inv = inv.at[safe_slot].min(
        jnp.where(pslot >= 0, jnp.arange(n, dtype=jnp.int32), n))
    plabel = jnp.where(plabel < big, inv[plabel], jnp.arange(n))
    return plabel, overflow


def fof_plan(num_particles: int, box_size: float, linking_length: float,
             capacity: int = 0, positions=None,
             max_capacity: int = 1024) -> dict:
    """Cell geometry for FoF (cells of size >= linking length).

    Unlike the force solvers (uniform-ish occupancy), FoF runs on
    *clustered* data where a single cell can hold a whole halo core; if
    `positions` is given, capacity is sized from the actual maximum cell
    occupancy (host readback, power-of-2 rounded to bound recompiles)
    but CAPPED at `max_capacity`: cells denser than that take the
    counted merged-cell approximation in fof_labels instead of inflating
    the padded [ncell^3, capacity] layout for every cell (the densest
    core cell would otherwise set the memory bill for the whole box).
    """
    nmax = max(min(int(math.floor(box_size / linking_length)), 128), 1)
    if capacity > 0:
        return {"ncell": nmax, "capacity": capacity}
    if positions is None:
        # no occupancy information: finest admissible lattice with a
        # generous per-cell headroom (capped)
        mean_occ = num_particles / max(nmax ** 3, 1)
        capacity = int(max(16, math.ceil(8.0 * mean_occ)))
        capacity = min(((capacity + 7) // 8) * 8, max_capacity)
        return {"ncell": nmax, "capacity": capacity}
    # Any cell size >= b is CORRECT (the 27-stencil covers all links);
    # finer cells cut per-cell pair work but on clustered data leave most
    # cells empty while the densest core still sets the capacity -- the
    # padded work C * 27 * K^2 then explodes (cell ~ b at 1M uniform:
    # occupancy 0.5 at K >= 128 = 65000x padding). Scan halvings of the
    # finest admissible lattice and take the cheapest padded layout.
    best = None
    ncell = nmax
    while ncell >= 4:
        max_occ = int(_max_cell_occupancy(positions, box_size, ncell))
        cap = min(max(16, 1 << (max_occ - 1).bit_length()), max_capacity)
        cost = ncell ** 3 * cap * cap
        if best is None or cost < best[0]:
            best = (cost, ncell, cap)
        ncell //= 2
    _, ncell, capacity = best
    return {"ncell": ncell, "capacity": capacity}


@partial(jax.jit, static_argnames=("ncell",))
def _max_cell_occupancy(positions, box_size, ncell: int):
    cell = jnp.clip(jnp.floor(positions / box_size * ncell).astype(
        jnp.int32), 0, ncell - 1)
    cid = (cell[:, 0] * ncell + cell[:, 1]) * ncell + cell[:, 2]
    counts = jax.ops.segment_sum(
        jnp.ones_like(cid), cid, num_segments=ncell ** 3)
    return jnp.max(counts)


# ---------------------------------------------------------------------------
# Halo catalog
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_halos", "min_particles"))
def catalog_from_labels(positions, velocities, masses, labels, box_size,
                        *, max_halos: int = 256, min_particles: int = 20,
                        overdensity: float = 200.0, mean_density=None,
                        g_const: float = 43.0071057317063):
    """Segment-reduce particle groups into a HaloCatalog
    (reference: extract_halos + compute properties,
    halo_finder.cpp:213-337)."""
    n = positions.shape[0]
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), labels,
                                 num_segments=n)
    # periodic-safe CoM: average unit-circle phases per axis
    theta = positions / box_size * (2.0 * jnp.pi)
    msum = jax.ops.segment_sum(masses, labels, num_segments=n)
    cx = jax.ops.segment_sum(masses[:, None] * jnp.cos(theta), labels,
                             num_segments=n)
    sx = jax.ops.segment_sum(masses[:, None] * jnp.sin(theta), labels,
                             num_segments=n)
    ang = jnp.arctan2(sx, cx)
    com = jnp.mod(ang / (2.0 * jnp.pi), 1.0) * box_size  # [N, 3]
    vel_sum = jax.ops.segment_sum(masses[:, None] * velocities, labels,
                                  num_segments=n)

    # rank halos by particle count
    eligible = counts >= min_particles
    score = jnp.where(eligible, counts, 0)
    k = min(max_halos, n)
    top_counts, top_roots = jax.lax.top_k(score, k)
    if k < max_halos:
        top_counts = jnp.pad(top_counts, (0, max_halos - k))
        top_roots = jnp.pad(top_roots, (0, max_halos - k))
    valid = top_counts >= min_particles
    num_halos = jnp.sum(valid.astype(jnp.int32))

    safe_roots = jnp.where(valid, top_roots, 0)
    h_mass = jnp.where(valid, msum[safe_roots], 0.0)
    h_com = jnp.where(valid[:, None], com[safe_roots], 0.0)
    h_vel = jnp.where(valid[:, None],
                      vel_sum[safe_roots]
                      / jnp.maximum(msum[safe_roots, None], 1e-30), 0.0)

    # per-particle halo id (index into the catalog) for membership ops;
    # invalid slots scatter into the dump index n (never index 0 -- a real
    # halo can be rooted at particle 0)
    scatter_roots = jnp.where(valid, top_roots, n)
    halo_of_root = jnp.full((n + 1,), -1, jnp.int32)
    halo_of_root = halo_of_root.at[scatter_roots].set(
        jnp.arange(max_halos, dtype=jnp.int32))
    halo_of_root = halo_of_root.at[n].set(-1)
    plabel = halo_of_root[jnp.minimum(labels, n)]

    # SO radius + vmax + angular momentum per halo (vectorized over halos
    # via radial mass histograms)
    nbins = 64
    if mean_density is None:
        mean_density = jnp.sum(masses) / box_size ** 3
    r_max = 0.1 * box_size
    edges = jnp.linspace(0.0, r_max, nbins + 1)[1:]      # bin upper edges

    def halo_profile(idx):
        center = h_com[idx]
        d = min_image(positions - center[None, :], box_size)
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        member = plabel == idx
        bin_idx = jnp.clip((r / r_max * nbins).astype(jnp.int32), 0,
                           nbins - 1)
        hist = jax.ops.segment_sum(masses, bin_idx, num_segments=nbins)
        m_enc = jnp.cumsum(hist)
        vol = 4.0 / 3.0 * jnp.pi * edges ** 3
        dens = m_enc / vol
        # largest radius with enclosed density >= Delta * rho_bar
        above = dens >= overdensity * mean_density
        r_delta = jnp.max(jnp.where(above, edges, 0.0))
        m_delta = jnp.max(jnp.where(above, m_enc, 0.0))
        v_circ2 = g_const * m_enc / jnp.maximum(edges, 1e-8)
        v_max = jnp.sqrt(jnp.max(jnp.where(edges <= jnp.maximum(
            r_delta, edges[0]), v_circ2, 0.0)))
        # angular momentum of FoF members about the CoM
        rel_v = velocities - h_vel[idx][None, :]
        ell = jnp.cross(d, rel_v) * masses[:, None]
        ell = jnp.sum(jnp.where(member[:, None], ell, 0.0), axis=0)
        return r_delta, m_delta, v_max, ell

    r_delta, m_delta, v_max, ell = jax.lax.map(
        halo_profile, jnp.arange(max_halos))
    r_delta = jnp.where(valid, r_delta, 0.0)
    v_max = jnp.where(valid, v_max, 0.0)
    ell = jnp.where(valid[:, None], ell, 0.0)

    # Peebles spin: lambda = L sqrt(|E|) / (G M^(5/2)); use the common
    # Bullock form lambda' = L / (sqrt(2) M V_delta R_delta)
    v_delta = jnp.sqrt(g_const * jnp.maximum(m_delta, 1e-30)
                       / jnp.maximum(r_delta, 1e-8))
    l_mag = jnp.sqrt(jnp.sum(ell * ell, axis=-1))
    spin = jnp.where(
        valid & (r_delta > 0),
        l_mag / (jnp.sqrt(2.0) * jnp.maximum(h_mass, 1e-30)
                 * v_delta * jnp.maximum(r_delta, 1e-8)),
        0.0)

    return HaloCatalog(
        num_halos=num_halos,
        n_particles=jnp.where(valid, top_counts, 0),
        center=h_com, velocity=h_vel, mass=h_mass,
        radius=r_delta, v_max=v_max,
        angular_momentum=ell, spin=spin,
        particle_label=plabel)


def find_halos(positions, velocities, masses, box_size, *,
               linking_length_factor: float = 0.2,
               min_particles: int = 20, max_halos: int = 256,
               overdensity: float = 200.0,
               g_const: float = 43.0071057317063) -> HaloCatalog:
    """One-call FoF + SO catalog (reference:
    FriendsOfFriends::find_halos, halo_finder.cpp:15-45).

    linking_length = factor * mean interparticle separation (b=0.2
    standard, the reference's default).
    """
    n = positions.shape[0]
    b = linking_length_factor * box_size / n ** (1.0 / 3.0)
    plan = fof_plan(n, float(box_size), float(b), positions=positions)
    labels, overflow = fof_labels(
        positions, box_size, b, ncell=plan["ncell"],
        capacity=plan["capacity"])
    return catalog_from_labels(
        positions, velocities, masses, labels, box_size,
        max_halos=max_halos, min_particles=min_particles,
        overdensity=overdensity, g_const=g_const)


def mass_function(catalog: HaloCatalog, box_size, num_bins: int = 16,
                  m_min=None, m_max=None):
    """dn/dlog10(M) [(Mpc/h)^-3] from the catalog (reference:
    compute_mass_function, halo_finder.cpp:339-361)."""
    m = catalog.mass
    valid = m > 0
    m_min = jnp.min(jnp.where(valid, m, jnp.inf)) if m_min is None else m_min
    m_max = jnp.max(m) if m_max is None else m_max
    lo, hi = jnp.log10(m_min), jnp.log10(m_max * (1 + 1e-6))
    edges = jnp.linspace(lo, hi, num_bins + 1)
    idx = jnp.clip(((jnp.log10(jnp.maximum(m, 1e-30)) - lo) / (hi - lo)
                    * num_bins).astype(jnp.int32), 0, num_bins - 1)
    counts = jax.ops.segment_sum(valid.astype(jnp.float32), idx,
                                 num_segments=num_bins)
    dlog = (hi - lo) / num_bins
    centers = 10.0 ** (0.5 * (edges[1:] + edges[:-1]))
    volume = box_size ** 3
    return centers, counts / (volume * dlog), counts
