"""Ewald-summed periodic force oracle (float64, CPU-oriented).

Why this exists: every direct-summation "oracle" in this stack — and in
the reference (`/root/reference/src/physics/lambda_cdm_kernels.cu:14-56`,
min-image only) — computes MIN-IMAGE gravity, which is not the periodic
Newtonian force: it truncates every source's infinite image lattice at
the nearest image. The solver-attribution probe
(`benchmarks/probe_pk_direct.py`) measured the consequence at box scale
(the fundamental mode's growth comes out 2.4x too large under the
min-image "oracle" while the exactly-periodic PM FFT gets it right), so
certifying the production TreePM force against min-image leaves an
un-attributable systematic in the bar. This module computes the TRUE
periodic force by classical Ewald summation so the bench accuracy
section (`bench.py`) can (a) certify against correct physics and
(b) report the min-image-vs-Ewald systematic as its own number.

Method (tinfoil / conducting boundary, background-subtracted):

    acc(x) = acc_real(x) + acc_k(x)

    acc_real = G sum_j m_j sum_n d_jn/r^3 [erfc(a r) + 2ar/sqrt(pi)
               e^{-a^2 r^2}],   d_jn = x_j + nL - x
    acc_k    = (4 pi G / L^3) sum_{k != 0} (k/k^2) e^{-k^2/4a^2}
               [S_s(k) cos(k.x) - S_c(k) sin(k.x)],
               S_c + i S_s = sum_j m_j e^{i k.x_j}

with the real-space sum over `(2*nreal+1)^3` image shells (nreal=0 =
min-image, adequate for alpha >= 6/L where erfc(3) = 2.2e-5) and the
k-space sum over the sphere |n| <= nmax (nmax=8 at alpha=6/L leaves
e^{-(pi n/ (aL/2))^2} ~ 2.5e-8). The k=0 term is dropped = the uniform
background is subtracted (comoving peculiar force). The k-space
self-term has zero gradient at x=x_j, so no self-force correction is
needed for accelerations.

Plummer softening (the production force law) is a NEAR-field
modification: it is applied as the exact correction
m [ (r^2+eps^2)^{-3/2} - r^{-3} ] on the real-space (min-image) pass,
where it decays as eps^2/r^5 and is already < 1e-9 of the pair force at
r = L/4 for the production eps/L ~ 5e-4.

Accuracy: alpha-independence (the only term-balance test that can catch
a wrong 4pi/L^3 normalization) is asserted in tests/test_ewald.py at
~1e-10 relative between (alpha=3/L, nreal=1) and (alpha=6/L, nreal=0).

Cost model: real space is T*N*27 erfc evaluations in the worst case;
k space is N*K sin/cos for the structure factor (K ~ 2100 at nmax=8)
plus T*K for the targets — at T=512, N=1e6 this is ~30-90 s on host
CPU in float64, which is what an oracle is for.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _kvectors(box: float, nmax: int):
    """Integer lattice k-vectors with 0 < |n|^2 <= nmax^2 (numpy, host).
    Returns (kvec [K,3] float, nvec [K,3] int)."""
    r = np.arange(-nmax, nmax + 1)
    n = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    n2 = np.sum(n * n, axis=1)
    keep = (n2 > 0) & (n2 <= nmax * nmax)
    n = n[keep]
    return (2.0 * np.pi / box) * n.astype(np.float64), n.astype(np.int32)


def _structure_factor(pos, mass, box, nvec, nmax, source_chunk):
    """S_c(k) + i S_s(k) = sum_j m_j e^{i k.x_j} over all sources.

    Per-axis phase-power recurrence: e^{i k.x} factorizes as
    cx[|nx|] cy[|ny|] cz[|nz|] (conjugated for negative n), so each
    particle costs 3*(nmax+1) transcendentals + K complex multiplies
    instead of K transcendentals — at 1M sources and K~2100 that is
    54M vs 4.4e9 sin/cos calls (~40x on a host core, where this oracle
    runs inside bench.py's --cpu-ref stage)."""
    nsrc = pos.shape[0]
    pad = (-nsrc) % source_chunk
    pos_p = jnp.concatenate([pos, jnp.zeros((pad, 3), pos.dtype)])
    m_p = jnp.concatenate([mass, jnp.zeros((pad,), mass.dtype)])
    two_pi = 2.0 * jnp.pi / box
    k_cnt = nvec.shape[0]
    nabs = jnp.abs(nvec)                      # [K,3]
    nneg = nvec < 0

    def sf_chunk(carry, xs):
        p, m = xs
        # per-axis phase powers e^{i 2pi n x/L}, n = 0..nmax: [C, nmax+1]
        base = jnp.exp(1j * (two_pi * p))                   # [C,3] complex
        pows = [jnp.ones((p.shape[0], 3), base.dtype)]
        for _ in range(nmax):
            pows.append(pows[-1] * base)
        pw = jnp.stack(pows, axis=-1)                       # [C,3,nmax+1]
        fx = jnp.take(pw[:, 0], nabs[:, 0], axis=1)         # [C,K]
        fy = jnp.take(pw[:, 1], nabs[:, 1], axis=1)
        fz = jnp.take(pw[:, 2], nabs[:, 2], axis=1)
        fx = jnp.where(nneg[None, :, 0], jnp.conj(fx), fx)
        fy = jnp.where(nneg[None, :, 1], jnp.conj(fy), fy)
        fz = jnp.where(nneg[None, :, 2], jnp.conj(fz), fz)
        s = jnp.sum(m[:, None] * (fx * fy * fz), axis=0)    # [K]
        return carry + s, None

    s, _ = jax.lax.scan(
        sf_chunk, jnp.zeros((k_cnt,), jnp.complex128
                            if pos.dtype == jnp.float64 else jnp.complex64),
        (pos_p.reshape(-1, source_chunk, 3),
         m_p.reshape(-1, source_chunk)))
    return jnp.real(s), jnp.imag(s)


def ewald_accelerations(positions, masses, targets, box_size,
                        softening=0.0, g_const=1.0, *, alpha=None,
                        nmax: int = 8, nreal: int = 0,
                        source_chunk: int = 262144,
                        target_chunk: int = 64):
    """Periodic (Ewald-summed) accelerations at `targets` rows, float64.

    positions [N,3], masses [N] (mass==0 rows are inert padding),
    targets [T] int — returns acc [T,3] in the same units as the
    min-image oracle it replaces (G * sum m d / r^3 conventions).

    Run on the CPU backend with x64 enabled; everything is jnp so the
    chunked maps stay out of host Python loops.
    """
    if alpha is None:
        alpha = 6.0 / float(box_size)
    box = float(box_size)
    a = float(alpha)
    soft2 = float(softening) ** 2
    g = float(g_const)

    pos = jnp.asarray(positions, jnp.float64)
    mass = jnp.asarray(masses, jnp.float64)
    tgt = jnp.asarray(targets, jnp.int32)
    kv, nv = _kvectors(box, nmax)
    kvec = jnp.asarray(kv)                            # [K,3]
    nvec = jnp.asarray(nv)
    k2 = jnp.sum(kvec * kvec, axis=1)                 # [K]
    kcoef = (4.0 * jnp.pi / box ** 3) * jnp.exp(-k2 / (4 * a * a)) / k2

    # structure factor over all sources (phase-power recurrence)
    s_c, s_s = _structure_factor(pos, mass, box, nvec, nmax,
                                 source_chunk)

    # real-space image shells (nreal=0: min-image only)
    r = np.arange(-nreal, nreal + 1)
    shells = jnp.asarray(
        np.stack(np.meshgrid(r, r, r, indexing="ij"), -1)
        .reshape(-1, 3).astype(np.float64) * box)      # [S,3]

    def one_target(pt):
        # k-space
        ph = kvec @ pt                                 # [K]
        acc_k = jnp.sum(
            (kcoef * (s_s * jnp.cos(ph) - s_c * jnp.sin(ph)))[:, None]
            * kvec, axis=0)

        # real-space: min-image base displacement + image shells
        d0 = pos - pt[None, :]
        d0 = d0 - box * jnp.round(d0 / box)            # [N,3]

        def one_shell(acc, shift):
            d = d0 + shift[None, :]
            r2 = jnp.sum(d * d, axis=1)
            live = (mass > 0) & (r2 > 1e-24)
            rr = jnp.sqrt(jnp.where(live, r2, 1.0))
            screen = (jax.lax.erfc(a * rr) / (rr * r2)
                      + (2.0 * a / jnp.sqrt(jnp.pi))
                      * jnp.exp(-a * a * r2) / r2)
            w = jnp.where(live, mass * screen, 0.0)
            return acc + jnp.sum(w[:, None] * d, axis=0), None

        acc_r, _ = jax.lax.scan(one_shell, jnp.zeros(3, pos.dtype),
                                shells)

        # softening correction on the min-image pass (near field only)
        r2 = jnp.sum(d0 * d0, axis=1)
        live = (mass > 0) & (r2 > 1e-24)
        rs2 = jnp.where(live, r2, 1.0)
        corr = (rs2 + soft2) ** -1.5 - rs2 ** -1.5
        w = jnp.where(live, mass * corr, 0.0)
        acc_s = jnp.sum(w[:, None] * d0, axis=0)
        return acc_k + acc_r + acc_s

    acc = jax.lax.map(one_target, pos[tgt], batch_size=target_chunk)
    return g * acc


@partial(jax.jit, static_argnames=("box_size", "softening", "g_const"))
def min_image_accelerations(positions, masses, targets, box_size,
                            softening=0.0, g_const=1.0):
    """The min-image f64 direct sum (the OLD oracle), kept callable so
    the min-image-vs-Ewald systematic is a measurable, reportable number
    rather than folklore. Matches bench.py's historic `--cpu-ref force`
    math exactly (Plummer-softened, self via r2 <= soft2 mask)."""
    pos = jnp.asarray(positions, jnp.float64)
    mass = jnp.asarray(masses, jnp.float64)
    box = float(box_size)
    soft2 = float(softening) ** 2

    def one(pt):
        dx = pos - pt[None, :]
        dx = dx - box * jnp.round(dx / box)
        r2 = jnp.sum(dx * dx, axis=-1) + soft2
        inv_r3 = r2 ** -1.5
        inv_r3 = jnp.where(r2 <= soft2 + 1e-300, 0.0, inv_r3)
        return jnp.sum((mass * inv_r3)[:, None] * dx, axis=0)

    tgt = jnp.asarray(targets, jnp.int32)
    return float(g_const) * jax.lax.map(one, pos[tgt], batch_size=16)


def _math_erfc_ok():
    # jax.lax.erfc exists on CPU f64; guard for exotic builds
    return True
