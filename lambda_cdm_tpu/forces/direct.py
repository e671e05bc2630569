"""Direct O(N^2) gravitational accelerations -- reference jnp path.

Capability parity with the reference's direct CUDA kernels
(compute_forces_direct / compute_forces_tiled / compute_forces_all_pairs,
src/physics/lambda_cdm_kernels.cu:14-287): softened Newtonian pairwise
gravity with minimum-image periodic boundaries.

Design notes (TPU-first, not a kernel translation):
  * The hot production path is the Pallas tiled kernel in
    ``lambda_cdm_tpu.ops.pallas_direct``; this module is the XLA-fusible
    reference implementation, the correctness oracle, and the small-N path.
  * Convention fix (SURVEY.md section 2.4): we always return *accelerations*
    [N,3]; the reference's tiled kernel inconsistently multiplied by mass.
  * Memory: the naive broadcast builds an [N, N, 3] intermediate; the
    chunked variant scans over row blocks so peak memory is [chunk, N, 3],
    which XLA keeps fused and is how 100k+ runs single-chip without Pallas.
  * A `modified_gravity` option mirrors ModifiedGravityKernel
    (force_computer_factory.cpp:150-243): F ~ (1 + alpha) * Newton.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def min_image(dx, box_size):
    """Minimum-image displacement for periodic boxes (reference applies the
    same wrap in every pairwise kernel, lambda_cdm_kernels.cu:30-37)."""
    return dx - box_size * jnp.round(dx / box_size)


def _pair_accel(dx, mass_j, softening2, g):
    """Acceleration contribution a_i from particle j at displacement dx."""
    r2 = jnp.sum(dx * dx, axis=-1) + softening2
    inv_r3 = jax.lax.rsqrt(r2) / r2          # (r^2)^(-3/2)
    return g * (mass_j * inv_r3)[..., None] * dx


def direct_accelerations(positions, masses, box_size, softening=0.01,
                         g_const=1.0, modified_gravity=0.0,
                         precision=None):
    """Softened pairwise accelerations, full [N,N] broadcast.

    a_i = G sum_j m_j (x_j - x_i) / (|x_j - x_i|^2 + eps^2)^(3/2)
    with minimum-image PBC. Use for N small enough that N^2 fits in HBM.
    """
    dx = min_image(positions[None, :, :] - positions[:, None, :], box_size)
    r2 = jnp.sum(dx * dx, axis=-1) + softening * softening
    inv_r3 = jax.lax.rsqrt(r2) / r2
    # zero self-interaction (softening keeps it finite; mask keeps it exact)
    n = positions.shape[0]
    inv_r3 = jnp.where(jnp.eye(n, dtype=bool), 0.0, inv_r3)
    acc = jnp.einsum("ij,j,ijk->ik", inv_r3, masses, dx,
                     precision=precision or jax.lax.Precision.HIGHEST)
    return g_const * (1.0 + modified_gravity) * acc


def direct_accelerations_chunked(positions, masses, box_size, softening=0.01,
                                 g_const=1.0, modified_gravity=0.0,
                                 chunk_size=4096, precision=None):
    """Row-blocked direct sum: O(N^2) flops, O(chunk*N) memory.

    The XLA analogue of the reference's shared-memory tiling
    (compute_forces_tiled, lambda_cdm_kernels.cu:144-221): i-rows are
    processed in blocks while all j columns stream through; XLA fuses the
    whole block computation.
    """
    n = positions.shape[0]
    pad = (-n) % chunk_size
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    num_chunks = pos_p.shape[0] // chunk_size
    soft2 = softening * softening

    def row_block(carry, i_block):
        pos_i = jax.lax.dynamic_slice_in_dim(
            pos_p, i_block * chunk_size, chunk_size, axis=0)
        dx = min_image(positions[None, :, :] - pos_i[:, None, :], box_size)
        r2 = jnp.sum(dx * dx, axis=-1) + soft2
        inv_r3 = jax.lax.rsqrt(r2) / r2
        # self-interaction: dx == 0 -> contribution 0 via explicit mask
        self_mask = r2 <= soft2 + 1e-30
        inv_r3 = jnp.where(self_mask, 0.0, inv_r3)
        acc = jnp.einsum("ij,j,ijk->ik", inv_r3, masses, dx,
                         precision=precision or jax.lax.Precision.HIGHEST)
        return carry, acc

    _, acc_blocks = jax.lax.scan(row_block, None, jnp.arange(num_chunks))
    acc = acc_blocks.reshape(-1, 3)[:n]
    return g_const * (1.0 + modified_gravity) * acc


@partial(jax.jit, static_argnames=("chunk_size",))
def potential_energy(positions, masses, box_size, softening=0.01,
                     g_const=1.0, chunk_size=2048):
    """Total pairwise potential energy
    U = -G/2 sum_{i != j} m_i m_j / sqrt(r_ij^2 + eps^2)
    (the reference's compute_energy PE half-sum,
    lambda_cdm_kernels.cu:338-408), row-blocked for memory."""
    n = positions.shape[0]
    pad = (-n) % chunk_size
    pos_p = jnp.pad(positions, ((0, pad), (0, 0)))
    mass_p = jnp.pad(masses, (0, pad))
    num_chunks = pos_p.shape[0] // chunk_size
    soft2 = softening * softening

    def row_block(carry, i_block):
        pos_i = jax.lax.dynamic_slice_in_dim(
            pos_p, i_block * chunk_size, chunk_size, axis=0)
        m_i = jax.lax.dynamic_slice_in_dim(
            mass_p, i_block * chunk_size, chunk_size, axis=0)
        dx = min_image(positions[None, :, :] - pos_i[:, None, :], box_size)
        r2 = jnp.sum(dx * dx, axis=-1) + soft2
        inv_r = jax.lax.rsqrt(r2)
        inv_r = jnp.where(r2 <= soft2 + 1e-30, 0.0, inv_r)
        pe = jnp.sum((m_i[:, None] * masses[None, :]) * inv_r)
        return carry + pe, None

    total, _ = jax.lax.scan(row_block, jnp.zeros((), positions.dtype),
                            jnp.arange(num_chunks))
    return -0.5 * g_const * total


def kinetic_energy(velocities, masses):
    """KE = sum 1/2 m v^2 (reference: compute_energy KE part,
    lambda_cdm_kernels.cu:345-352)."""
    return 0.5 * jnp.sum(masses * jnp.sum(velocities * velocities, axis=-1))
