"""Multi-chip force solvers via shard_map over the device mesh.

Replaces the reference's MPI force pipeline (decompose -> exchange ->
local force -> MPI_Allreduce, src/mpi/cluster_comm.cpp:90-216) with ICI
collectives:

  * `ring_direct_accelerations`: the O(N^2) solver as a ppermute ring --
    each device keeps its particle slab resident and passes a rotating
    j-slab around the ring (bandwidth-optimal systolic all-pairs; the ICI
    analogue of the reference's ghost exchange + local pairwise, and
    literally the "ring-pass structure" called for in SURVEY.md sec. 5).
    Memory per device is O(N/D); each of the D ring steps overlaps the
    next ppermute with local tile compute (XLA schedules the collective
    permute asynchronously).

  * `sharded_pm_accelerations`: the PM solver under GSPMD -- particle
    arrays sharded along N, the deposit grid sharded in x-slabs; XLA
    inserts the all-to-all transposes for the distributed rfftn and the
    halo collectives for CIC (the transpose-based pencil FFT of SURVEY.md
    sec. 7 M5, compiler-generated).

Everything works on any mesh size including 1 (degenerates to the
single-chip path), and is validated on the 8-device virtual CPU mesh in
tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import SHARD_AXIS, axis_size as _axis_size, particle_sharding
from ..forces.direct import min_image


def _partial_direct(pos_i, pos_j, mass_j, box_size, softening2):
    """Accelerations on pos_i from sources pos_j (both local blocks)."""
    dx = min_image(pos_j[None, :, :] - pos_i[:, None, :], box_size)
    r2 = jnp.sum(dx * dx, axis=-1) + softening2
    inv_r = jax.lax.rsqrt(r2)
    w = mass_j[None, :] * inv_r * inv_r * inv_r
    return jnp.einsum("ij,ijk->ik", w, dx)


@partial(jax.jit, static_argnames=("box_size", "softening", "axis_name",
                                   "mesh"))
def ring_direct_accelerations(positions, masses, *, box_size, softening,
                              g_const=1.0, mesh: Mesh,
                              axis_name: str = SHARD_AXIS):
    """Direct O(N^2) accelerations over a sharded particle set.

    positions/masses may live anywhere; they are resharded along N.
    Requires N % n_devices == 0 (pad with zero-mass particles otherwise --
    the engine's sharded path does this automatically). `axis_name` may
    be a tuple of mesh axes (3D block mesh): the ring then runs over the
    flattened device order.
    """
    n_dev = _axis_size(mesh, axis_name)
    soft2 = softening * softening

    def local(pos_i, m_i):
        # ring: after k steps we hold the slab originally on rank r+k
        def step(k, carry):
            acc, pos_j, m_j = carry
            acc = acc + _partial_direct(pos_i, pos_j, m_j, box_size, soft2)
            perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
            pos_j = jax.lax.ppermute(pos_j, axis_name, perm)
            m_j = jax.lax.ppermute(m_j, axis_name, perm)
            return acc, pos_j, m_j

        acc0 = jnp.zeros_like(pos_i)
        acc, _, _ = jax.lax.fori_loop(0, n_dev, step, (acc0, pos_i, m_i))
        # zero-mass rows are inert padding: no force AT them either
        return jnp.where((m_i > 0)[:, None], acc, 0.0)

    ps = particle_sharding(mesh, axis_name)
    positions = jax.lax.with_sharding_constraint(positions, ps)
    masses = jax.lax.with_sharding_constraint(masses, ps)
    acc = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name))(positions, masses)
    return g_const * acc


@partial(jax.jit, static_argnames=("ng", "split_scale", "mesh", "axis_name"))
def sharded_pm_accelerations(positions, masses, ng: int, box_size,
                             g_const=1.0, *, split_scale=0.0,
                             mesh: Mesh, axis_name: str = SHARD_AXIS):
    """PM accelerations with GSPMD sharding: particles along N, grid in
    x-slabs. XLA auto-inserts the distributed-FFT transposes and the
    scatter/gather collectives."""
    from ..forces.pm import pm_accelerations

    ps = particle_sharding(mesh, axis_name)
    positions = jax.lax.with_sharding_constraint(positions, ps)
    masses = jax.lax.with_sharding_constraint(masses, ps)
    acc = pm_accelerations(positions, masses, ng, box_size, g_const,
                           split_scale=split_scale)
    return jax.lax.with_sharding_constraint(acc, ps)


def sharded_energy(positions, velocities, masses, *, box_size, softening,
                   g_const, mesh: Mesh, axis_name: str = SHARD_AXIS):
    """KE + ring-pass PE with psum reduction (the MPI_Allreduce analogue,
    cluster_comm.cpp:208-216)."""
    n_dev = _axis_size(mesh, axis_name)
    soft2 = softening * softening

    def local(pos_i, vel_i, m_i):
        ke = 0.5 * jnp.sum(m_i * jnp.sum(vel_i * vel_i, axis=-1))

        def step(k, carry):
            pe, pos_j, m_j = carry
            dx = min_image(pos_j[None, :, :] - pos_i[:, None, :], box_size)
            r2 = jnp.sum(dx * dx, axis=-1) + soft2
            inv_r = jax.lax.rsqrt(r2)
            inv_r = jnp.where(r2 <= soft2 + 1e-30, 0.0, inv_r)
            pe = pe + jnp.sum(m_i[:, None] * m_j[None, :] * inv_r)
            perm = [(s, (s + 1) % n_dev) for s in range(n_dev)]
            return (pe, jax.lax.ppermute(pos_j, axis_name, perm),
                    jax.lax.ppermute(m_j, axis_name, perm))

        # init from local data so the carry is device-varying (shard_map
        # vma rule: a fresh constant would be 'replicated' and mismatch
        # the ppermute'd outputs)
        pe0 = jnp.sum(m_i) * 0.0
        pe, _, _ = jax.lax.fori_loop(0, n_dev, step, (pe0, pos_i, m_i))
        ke = jax.lax.psum(ke, axis_name)
        pe = jax.lax.psum(pe, axis_name)
        return ke, -0.5 * g_const * pe

    ke, pe = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()))(positions, velocities, masses)
    return {"kinetic": ke, "potential": pe, "total": ke + pe}
