"""Pallas TPU kernel: tiled O(N^2) softened pairwise gravity.

This is the TPU-native replacement for the reference's CUDA force kernels
(compute_forces_tiled's 256-wide shared-memory tiles,
src/physics/lambda_cdm_kernels.cu:144-221, and the TensorRT NBodyForce
plugin's fused fp16 kernel, src/tensorrt/nbody_plugins.cu:53-129): one
compiled kernel that streams j-particle tiles from HBM through VMEM with
double-buffered async DMA while an i-resident tile accumulates
accelerations on the VPU.

Layout notes (why this isn't a CUDA translation):
  * particles are stored as a [4, Np] structure-of-arrays (x, y, z, m) so
    the particle index lands on the 128-wide lane dimension;
  * the pairwise interaction matrix is computed componentwise as
    [TILE_I, TILE_J] VPU tiles via rank-broadcasting ([TI,1] vs [1,TJ]),
    never materializing an [N, N, 3] tensor;
  * periodic minimum-image wrapping is fused into the tile computation;
  * padding particles carry zero mass, so no bounds masking is needed in
    the inner loop (their contribution is exactly 0), and the softened
    r^2 >= eps^2 > 0 keeps the self-interaction term finite with
    dx = 0 contributing nothing.

Accumulation is fp32 (the 1e-3-vs-fp64 fidelity bar; SURVEY.md section 7
"Hard parts"). Inputs may be bf16 for HBM-bandwidth savings at large N --
coordinates are upcast in VMEM before squaring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# i-tile resident rows (sublanes) and j-tile streamed lanes per DMA chunk
TILE_I = 256
TILE_J = 2048
# v2 keeps three [TILE_I, TILE_J] f32 accumulators resident in VMEM
# (accumulate-then-reduce); 2048 lanes would blow the 16 MB VMEM budget
TILE_J_V2 = 512
# symmetric-variant tile edge (i rows AND j lanes)
TILE_S = 512


def _direct_kernel_sym(pts_hbm, out_ref, jc_ref, *, box_size, softening2,
                       n_tiles, periodic):
    """Newton's-third-law variant: each unordered pair computed ONCE.

    The tile count P is padded ODD, so program p owns i-tile p and sweeps
    j-tiles q = (p+k) mod P for k = 0..(P-1)/2 -- the classic half-matrix
    wrap: every unordered tile pair lands on exactly one program, total
    P(P+1)/2 tiles instead of P^2.

      k = 0   self tile: both pair orderings are present in the [T, T]
              tile, so plain row accumulation is already complete;
      k >= 1  rows accumulate i-forces per lane (one cross-lane reduce at
              the end, as _direct_kernel_v2); columns are reduced over
              sublanes per tile and shipped NEGATED to jc_ref[k-1] --
              tile q's owner reduces them afterwards (XLA gather + sum in
              the wrapper; acc_j = -sum_i w d by symmetry).

    Same per-pair math and units as _direct_kernel (exact per-pair
    minimum image in physical units; see the NOTE below on why periodic
    gravity gets no cheaper image approximation).
    """
    p = pl.program_id(0)
    inv_box = 1.0 / box_size
    half = (n_tiles - 1) // 2
    T = TILE_S

    def body(jbuf, ibuf, accx, accy, accz, sem):
        idma = pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(p * T, T)], ibuf, sem.at[2])
        idma.start()
        idma.wait()
        xi = jnp.transpose(ibuf[0:1, :])        # [T, 1]
        yi = jnp.transpose(ibuf[1:2, :])
        zi = jnp.transpose(ibuf[2:3, :])
        mi = jnp.transpose(ibuf[3:4, :])

        def get_dma(slot, k):
            q = jax.lax.rem(p + k, n_tiles)
            return pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(q * T, T)],
                jbuf.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)

        def j_step(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            @pl.when(k + 1 <= half)
            def _():
                get_dma(nxt, k + 1).start()

            get_dma(slot, k).wait()

            xj = jbuf[slot, 0:1, :]                        # [1, T]
            yj = jbuf[slot, 1:2, :]
            zj = jbuf[slot, 2:3, :]
            mj = jbuf[slot, 3:4, :]

            dx = xj - xi                                   # [T, T]
            dy = yj - yi
            dz = zj - zi
            if periodic:
                dx = dx - box_size * jnp.round(dx * inv_box)
                dy = dy - box_size * jnp.round(dy * inv_box)
                dz = dz - box_size * jnp.round(dz * inv_box)
            r2 = dx * dx + (dy * dy + (dz * dz + softening2))
            inv_r = jax.lax.rsqrt(r2)
            # symmetric pair FORCE m_i m_j f d (shared between both
            # directions); the wrapper divides by mass once per particle
            w = (mj * mi) * (inv_r * inv_r * inv_r)
            tx = w * dx
            ty = w * dy
            tz = w * dz
            accx[...] += tx
            accy[...] += ty
            accz[...] += tz

            @pl.when(k >= 1)
            def _():
                # acc_j gets the SAME products, reduced over i (sublanes)
                # and negated (Newton's third law). k-1 indexes a LEADING
                # dim of the [1, half, 1, 3T] block (dynamic sublane
                # offsets would need 8-alignment).
                jc_ref[0, k - 1, 0:1, 0:T] = \
                    -jnp.sum(tx, axis=0, keepdims=True)
                jc_ref[0, k - 1, 0:1, T:2 * T] = \
                    -jnp.sum(ty, axis=0, keepdims=True)
                jc_ref[0, k - 1, 0:1, 2 * T:3 * T] = \
                    -jnp.sum(tz, axis=0, keepdims=True)
            return ()

        jax.lax.fori_loop(0, half + 1, j_step, ())

        # F_i / m_i (zero-mass padding rows stay exactly zero)
        inv_mi = jnp.where(mi > 0, 1.0 / mi, 0.0)         # [T, 1]
        out_ref[0:1, :] = jnp.transpose(
            jnp.sum(accx[...], axis=1, keepdims=True) * inv_mi)
        out_ref[1:2, :] = jnp.transpose(
            jnp.sum(accy[...], axis=1, keepdims=True) * inv_mi)
        out_ref[2:3, :] = jnp.transpose(
            jnp.sum(accz[...], axis=1, keepdims=True) * inv_mi)
        out_ref[3:4, :] = jnp.zeros((1, T), jnp.float32)

    pl.run_scoped(
        body,
        jbuf=pltpu.VMEM((2, 4, TILE_S), pts_hbm.dtype),
        ibuf=pltpu.VMEM((4, TILE_S), pts_hbm.dtype),
        accx=pltpu.VMEM((TILE_S, TILE_S), jnp.float32),
        accy=pltpu.VMEM((TILE_S, TILE_S), jnp.float32),
        accz=pltpu.VMEM((TILE_S, TILE_S), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


def _direct_kernel_v2(pts_hbm, out_ref, *, box_size, softening2, n_j_tiles,
                      periodic):
    """Opt-in faster variant of _direct_kernel (v5e 100k: 104 vs 114 ms):

      * coordinates arrive PRE-SCALED to box units ([0, 1)), so the
        minimum image is `dx -= round(dx)` -- 2 VPU ops per component
        instead of 3 (the 1/box rescale amortizes into the caller's
        g_const/box^2 output scaling, with softening in box units too);
      * per-lane accumulation across j-tiles with ONE cross-lane
        reduction at the end (the short-range kernel's trick);
      * r^2 accumulates as an FMA chain seeded with softening^2.

    NOT the default: the box-unit intermediates (inv_r_b^3 ~ 1e7) cost
    ~60x accuracy vs a float64 oracle (2.8e-4 vs 4.6e-6 max abs at 777
    particles) for a 9% win, and this kernel doubles as the test oracle.
    """
    i = pl.program_id(0)

    def body(jbuf, ibuf, accx, accy, accz, sem):
        idma = pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(i * TILE_I, TILE_I)], ibuf, sem.at[2])
        idma.start()
        idma.wait()
        xi = jnp.transpose(ibuf[0:1, :])        # [TILE_I, 1]
        yi = jnp.transpose(ibuf[1:2, :])
        zi = jnp.transpose(ibuf[2:3, :])

        def get_dma(slot, jc):
            return pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(jc * TILE_J_V2, TILE_J_V2)],
                jbuf.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        accx[...] = jnp.zeros_like(accx)
        accy[...] = jnp.zeros_like(accy)
        accz[...] = jnp.zeros_like(accz)

        def j_step(jc, _):
            slot = jc % 2
            nxt = (jc + 1) % 2

            @pl.when(jc + 1 < n_j_tiles)
            def _():
                get_dma(nxt, jc + 1).start()

            get_dma(slot, jc).wait()

            xj = jbuf[slot, 0:1, :].astype(jnp.float32)   # [1, TILE_J]
            yj = jbuf[slot, 1:2, :].astype(jnp.float32)
            zj = jbuf[slot, 2:3, :].astype(jnp.float32)
            mj = jbuf[slot, 3:4, :].astype(jnp.float32)

            dx = xj - xi                                   # [TI, TJ]
            dy = yj - yi
            dz = zj - zi
            if periodic:
                dx = dx - jnp.round(dx)
                dy = dy - jnp.round(dy)
                dz = dz - jnp.round(dz)
            r2 = dx * dx + (dy * dy + (dz * dz + softening2))
            inv_r = jax.lax.rsqrt(r2)
            w = mj * (inv_r * inv_r * inv_r)               # m_j / r_b^3
            accx[...] += w * dx
            accy[...] += w * dy
            accz[...] += w * dz
            return ()

        jax.lax.fori_loop(0, n_j_tiles, j_step, ())

        out_ref[0:1, :] = jnp.transpose(
            jnp.sum(accx[...], axis=1, keepdims=True))
        out_ref[1:2, :] = jnp.transpose(
            jnp.sum(accy[...], axis=1, keepdims=True))
        out_ref[2:3, :] = jnp.transpose(
            jnp.sum(accz[...], axis=1, keepdims=True))
        out_ref[3:4, :] = jnp.zeros((1, TILE_I), jnp.float32)

    pl.run_scoped(
        body,
        jbuf=pltpu.VMEM((2, 4, TILE_J_V2), pts_hbm.dtype),
        ibuf=pltpu.VMEM((4, TILE_I), pts_hbm.dtype),
        accx=pltpu.VMEM((TILE_I, TILE_J_V2), jnp.float32),
        accy=pltpu.VMEM((TILE_I, TILE_J_V2), jnp.float32),
        accz=pltpu.VMEM((TILE_I, TILE_J_V2), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


def _direct_kernel(pts_hbm, out_ref, *, box_size, softening2, n_j_tiles,
                   periodic):
    """One grid instance: accelerations for an i-tile of TILE_I particles.

    pts_hbm: [4, Np] (x,y,z,m) in ANY/HBM -- j-tiles DMA'd on demand.
    out_ref: [4, TILE_I] VMEM block (rows ax, ay, az, unused).
    """
    i = pl.program_id(0)
    inv_box = 1.0 / box_size

    def body(jbuf, ibuf, acc, sem):
        # bring the i-tile into VMEM once, then transpose to column layout
        idma = pltpu.make_async_copy(
            pts_hbm.at[:, pl.ds(i * TILE_I, TILE_I)], ibuf, sem.at[2])
        idma.start()
        idma.wait()
        xi = jnp.transpose(ibuf[0:1, :])        # [TILE_I, 1]
        yi = jnp.transpose(ibuf[1:2, :])
        zi = jnp.transpose(ibuf[2:3, :])

        def get_dma(slot, jc):
            return pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(jc * TILE_J, TILE_J)],
                jbuf.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        acc[...] = jnp.zeros_like(acc)

        def j_step(jc, _):
            slot = jc % 2
            nxt = (jc + 1) % 2

            @pl.when(jc + 1 < n_j_tiles)
            def _():
                get_dma(nxt, jc + 1).start()

            get_dma(slot, jc).wait()

            xj = jbuf[slot, 0:1, :].astype(jnp.float32)   # [1, TILE_J]
            yj = jbuf[slot, 1:2, :].astype(jnp.float32)
            zj = jbuf[slot, 2:3, :].astype(jnp.float32)
            mj = jbuf[slot, 3:4, :].astype(jnp.float32)

            dx = xj - xi                                   # [TI, TJ]
            dy = yj - yi
            dz = zj - zi
            if periodic:
                # minimum image (reference wraps identically,
                # lambda_cdm_kernels.cu:30-37)
                dx = dx - box_size * jnp.round(dx * inv_box)
                dy = dy - box_size * jnp.round(dy * inv_box)
                dz = dz - box_size * jnp.round(dz * inv_box)
            r2 = dx * dx + dy * dy + dz * dz + softening2
            inv_r = jax.lax.rsqrt(r2)
            w = mj * (inv_r * inv_r * inv_r)               # m_j / r^3
            acc[:, 0:1] += jnp.sum(w * dx, axis=1, keepdims=True)
            acc[:, 1:2] += jnp.sum(w * dy, axis=1, keepdims=True)
            acc[:, 2:3] += jnp.sum(w * dz, axis=1, keepdims=True)
            return ()

        jax.lax.fori_loop(0, n_j_tiles, j_step, ())

        out_ref[0:3, :] = jnp.transpose(acc[:, 0:3])
        out_ref[3:4, :] = jnp.zeros((1, TILE_I), jnp.float32)

    pl.run_scoped(
        body,
        jbuf=pltpu.VMEM((2, 4, TILE_J), pts_hbm.dtype),
        ibuf=pltpu.VMEM((4, TILE_I), pts_hbm.dtype),
        acc=pltpu.VMEM((TILE_I, 8), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((3,)),
    )


@functools.partial(jax.jit, static_argnames=(
    "box_size", "softening", "periodic", "interpret", "variant"))
def pallas_direct_accelerations(positions, masses, box_size, softening=0.01,
                                g_const=1.0, *, periodic: bool = True,
                                interpret: bool = False,
                                variant: str = "v1"):
    """Softened pairwise accelerations [N,3] via the tiled Pallas kernel.

    Drop-in replacement for forces.direct.direct_accelerations (same
    minimum-image PBC convention); this is the production single-chip path
    the `direct` force computer dispatches to on TPU. `box_size` and
    `softening` are compile-time constants (fixed per simulation), folded
    straight into the kernel. Requires softening > 0 (keeps the fused
    self-interaction term finite).
    """
    box_size = float(box_size)
    softening = float(softening)
    if softening <= 0.0:
        raise ValueError("pallas direct kernel requires softening > 0")
    n = positions.shape[0]
    if variant in ("sym", "sym2"):
        return _pallas_direct_sym(positions, masses, box_size, softening,
                                  g_const, periodic=periodic,
                                  interpret=interpret,
                                  scaled=(variant == "sym2"))
    tile_j = TILE_J_V2 if variant == "v2" else TILE_J
    tile = max(TILE_I, tile_j)
    n_pad = ((n + tile - 1) // tile) * tile

    scale = 1.0 / box_size if variant == "v2" else 1.0
    pts = jnp.zeros((4, n_pad), jnp.float32)
    pts = pts.at[0:3, :n].set(positions.T.astype(jnp.float32) * scale)
    pts = pts.at[3, :n].set(masses.astype(jnp.float32))

    n_i_tiles = n_pad // TILE_I
    n_j_tiles = n_pad // tile_j

    kfn = {"v1": _direct_kernel, "v2": _direct_kernel_v2}[variant]
    kernel = functools.partial(
        kfn, box_size=box_size,
        softening2=(softening * scale) ** 2, n_j_tiles=n_j_tiles,
        periodic=periodic)

    out = pl.pallas_call(
        kernel,
        grid=(n_i_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, TILE_I), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * 22,
            bytes_accessed=n_pad * 16 * (n_i_tiles + 1),
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(pts)

    # v2 computed in box units: accelerations scale back by 1/box^2
    return (g_const * scale * scale) * out[0:3, :n].T


def _pallas_direct_sym(positions, masses, box_size, softening, g_const, *,
                       periodic: bool = True, interpret: bool = False,
                       scaled: bool = False):
    """Symmetric-pair direct solver: ~2x fewer pair evaluations than v1
    at identical per-pair math (exact minimum image; physical units by
    default, box units with `scaled` -- the v2 trade: the wrap becomes
    `dx -= round(dx)`, ~10% faster at ~2.8e-4 vs 5e-6 accuracy).

    The kernel emits per-(program, offset) j-tile FORCE contributions to
    a [P, half, 1, 3T] scratch; program p's slot k targets tile
    q = (p+1+k) mod P, so the combination is a shift-and-add scan (no
    gather). Forces divide by mass once per particle at the end.
    """
    n = positions.shape[0]
    T = TILE_S
    p_tiles = (n + T - 1) // T
    if p_tiles % 2 == 0:
        p_tiles += 1          # odd P => the wrap covers each pair once
    n_pad = p_tiles * T
    half = (p_tiles - 1) // 2

    scale = 1.0 / box_size if scaled else 1.0
    pts = jnp.zeros((4, n_pad), jnp.float32)
    pts = pts.at[0:3, :n].set(positions.T.astype(jnp.float32) * scale)
    pts = pts.at[3, :n].set(masses.astype(jnp.float32))

    kernel = functools.partial(
        _direct_kernel_sym, box_size=box_size * scale,
        softening2=(softening * scale) ** 2, n_tiles=p_tiles,
        periodic=periodic)

    out, jc = pl.pallas_call(
        kernel,
        grid=(p_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((4, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(half, 1), 1, 3 * T),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((p_tiles, max(half, 1), 1, 3 * T),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * n_pad * 13,
            bytes_accessed=n_pad * 16 * (p_tiles // 2 + 1),
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(pts)

    acc = out[0:3, :]                                     # [3, n_pad]
    if half > 0:
        def shift_add(c, xs):
            arr, k = xs                                   # [P, 3T]
            return c + jnp.roll(arr, k + 1, axis=0), None

        accj, _ = jax.lax.scan(
            shift_add, jnp.zeros((p_tiles, 3 * T), jnp.float32),
            (jc[:, :, 0, :].transpose(1, 0, 2), jnp.arange(half)))
        accj = accj.reshape(p_tiles, 3, T).transpose(1, 0, 2) \
            .reshape(3, n_pad)
        inv_m = jnp.where(pts[3] > 0, 1.0 / pts[3], 0.0)
        acc = acc + accj * inv_m[None, :]
    # scaled (box-unit) coords: accelerations carry 1/box^2
    return (g_const * scale * scale) * acc[:, :n].T


# NOTE (round-2 finding): a "sorted tile-image" fast variant (coarse
# cell sort + one periodic image choice per tile anchor instead of per
# pair) was built and measured at 62 ms/100k (vs 114 exact) -- and then
# REMOVED: for 1/r^2 the net force is a small residual of large
# cancellations, and the wrong-image errors on far pairs are coherent
# per tile (they share the anchor), not random. Measured p50 per-particle
# force error was 4x at 100k uniform. Periodic gravity needs the exact
# per-pair minimum image; approximate it only through the TreePM split.

# NOTE (round-2 cont. finding): the sym kernel is effectively at the VPU
# speed-of-light for exact periodic gravity on v5e. Measured at 100k:
# sym 75.8 ms; the SAME kernel with the min-image wrap compiled out
# (periodic=False ceiling probe) is 65.1 ms -- the exact per-pair image
# costs only ~14%, and the remaining ~26 VPU ops/pair are irreducible
# (rsqrt + r^2 + force assembly + Newton's-third-law bookkeeping).
# sym2 (box-unit coords, 2-op wrap) measured SLOWER (78.6 ms) despite
# fewer ops -- not worth its 60x accuracy cost. Tile edges 768/1024 fail
# to compile (VMEM). MXU offload is precision-dead: r^2 via the Gram
# identity cancels catastrophically in f32 at softening scales
# (soft^2/coord^2 ~ 1e-7 << f32 eps * |x|^2). The reference's RTX-4090
# number (120 ms, README.md:155) is beaten 1.6x; further direct-sum
# gains on this chip require lower-precision physics, not engineering.
