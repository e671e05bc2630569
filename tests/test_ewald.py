"""Ewald periodic-force oracle validation.

The only term-balance test that can catch a wrong k-space normalization
is alpha-independence: the real/k split moves force weight between the
two sums, so sum-correctness at two very different alphas (with the
real-space image shells sized for the smaller one) pins the 4 pi / L^3
coefficient. The L/2 symmetry point then demonstrates the min-image
systematic this oracle exists to remove (reference parity note: the
reference's own oracle, /root/reference/src/physics/lambda_cdm_kernels
.cu:14-56, is min-image and would fail that check by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.ewald import (ewald_accelerations,
                                         min_image_accelerations)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


BOX = 10.0


def _random_set(n=48, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, BOX, (n, 3))
    mass = rng.uniform(0.5, 2.0, (n,))
    return jnp.asarray(pos), jnp.asarray(mass)


def test_alpha_independence():
    pos, mass = _random_set()
    tgt = jnp.arange(pos.shape[0])
    a1 = ewald_accelerations(pos, mass, tgt, BOX, softening=0.05,
                             alpha=3.0 / BOX, nreal=1, nmax=8,
                             source_chunk=16, target_chunk=16)
    a2 = ewald_accelerations(pos, mass, tgt, BOX, softening=0.05,
                             alpha=6.0 / BOX, nreal=0, nmax=8,
                             source_chunk=16, target_chunk=16)
    scale = float(jnp.sqrt(jnp.mean(jnp.sum(a1 * a1, axis=-1))))
    dev = float(jnp.max(jnp.linalg.norm(a1 - a2, axis=-1))) / scale
    # alpha=6/L + min-image truncates real space at erfc(3) ~ 2e-5 of a
    # single pair's force; observed agreement is ~1e-6 relative
    assert dev < 3e-5, f"alpha split disagreement {dev:.2e}"


def test_half_box_symmetry_point():
    """A target at exactly L/2 from a lone source is equidistant from the
    source's two nearest images: the TRUE periodic force is zero. The
    min-image force is G m / (L/2)^2 — the systematic in one number."""
    pos = jnp.asarray([[0.0, 0.0, 0.0], [BOX / 2, 0.0, 0.0]])
    mass = jnp.asarray([1.0, 0.0])      # massless test particle target
    tgt = jnp.asarray([1])
    a_ew = np.asarray(ewald_accelerations(pos, mass, tgt, BOX,
                                          softening=0.0, nmax=8))
    a_mi = np.asarray(min_image_accelerations(pos, mass, tgt, BOX,
                                              softening=0.0))
    mi_mag = float(np.linalg.norm(a_mi))
    assert mi_mag > 0.03                      # 1/(L/2)^2 = 0.04
    assert float(np.linalg.norm(a_ew)) < 1e-3 * mi_mag


def test_near_field_is_newtonian():
    """At r << L the periodic correction is tidal (~ (r/L)^3): the pair
    force must match the softened direct force to < 1%."""
    r = 0.01 * BOX
    eps = 0.02
    pos = jnp.asarray([[1.0, 1.0, 1.0], [1.0 + r, 1.0, 1.0]])
    mass = jnp.asarray([2.0, 0.0])
    a_ew = np.asarray(ewald_accelerations(pos, mass, jnp.asarray([1]),
                                          BOX, softening=eps, nmax=8))
    direct = -2.0 * r / (r * r + eps * eps) ** 1.5
    assert abs(a_ew[0, 0] - direct) < 0.01 * abs(direct)
    assert np.all(np.abs(a_ew[0, 1:]) < 1e-6 * abs(direct))


def test_momentum_conservation():
    pos, mass = _random_set(n=32, seed=3)
    tgt = jnp.arange(pos.shape[0])
    acc = np.asarray(ewald_accelerations(pos, mass, tgt, BOX,
                                         softening=0.05, nmax=8,
                                         source_chunk=16))
    net = np.abs(np.sum(np.asarray(mass)[:, None] * acc, axis=0))
    scale = float(np.sqrt(np.mean(np.sum(acc * acc, axis=-1)))) \
        * float(np.sum(mass))
    assert np.all(net < 1e-8 * scale)


def test_zero_mass_rows_are_inert():
    """Padding convention: mass==0 rows contribute nothing and their own
    entries are still computable (engine invariant; CLAUDE.md)."""
    pos, mass = _random_set(n=24, seed=5)
    padded_pos = jnp.concatenate([pos, jnp.zeros((8, 3))])
    padded_mass = jnp.concatenate([mass, jnp.zeros((8,))])
    tgt = jnp.arange(24)
    a1 = np.asarray(ewald_accelerations(pos, mass, tgt, BOX,
                                        softening=0.05, source_chunk=8))
    a2 = np.asarray(ewald_accelerations(padded_pos, padded_mass, tgt,
                                        BOX, softening=0.05,
                                        source_chunk=8))
    np.testing.assert_allclose(a1, a2, rtol=1e-12, atol=1e-14)
