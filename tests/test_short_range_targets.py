"""Parity: the targets-only short-range helper vs the full lattice pass.

short_range_targets is the jnp leg of bench.py's 3-way force-accuracy
attribution; it must reproduce short_range_bucketed's pair math exactly
(same 27-cell stencil, min-image, polynomial split) on arbitrary rows.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.forces.treepm import (bucket_particles,
                                          short_range_bucketed,
                                          short_range_targets)

BOX = 8.0
NCELL = 4
CAP = 256


def _bucketed_set(n=700, seed=0):
    rng = np.random.default_rng(seed)
    # clustered: half uniform, half in two tight blobs (exercises
    # crowded cells + cross-boundary neighbor wraps)
    u = rng.uniform(0, BOX, (n // 2, 3))
    b1 = (rng.normal(0, 0.3, (n // 4, 3)) + [0.1, 7.9, 4.0]) % BOX
    b2 = (rng.normal(0, 0.2, (n - n // 2 - n // 4, 3)) + 4.0) % BOX
    pos = jnp.asarray(np.concatenate([u, b1, b2]), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), jnp.float32)
    bpos, bmass, _, ovf = bucket_particles(pos, mass, BOX, ncell=NCELL,
                                           capacity=CAP)
    assert int(ovf) == 0, "test geometry must not overflow"
    return bpos, bmass


def test_targets_match_lattice_pass():
    bpos, bmass = _bucketed_set()
    acc_full = short_range_bucketed(bpos, bmass, BOX, 0.9, 0.05,
                                    ncell=NCELL, capacity=CAP,
                                    use_poly=True)          # [C, K, 3]
    live = np.nonzero(np.asarray(bmass).ravel() > 0)[0]
    rows = jnp.asarray(np.random.default_rng(1).choice(
        live, size=128, replace=False), jnp.int32)
    soa = jnp.moveaxis(bpos, -1, 0)                          # [3, C, K]
    acc_t = short_range_targets(soa, bmass, rows, BOX, 0.9, 0.05,
                                ncell=NCELL, capacity=CAP,
                                use_poly=True)               # [T, 3]
    ref = np.asarray(acc_full.reshape(-1, 3))[np.asarray(rows)]
    scale = float(np.sqrt(np.mean(np.sum(ref ** 2, axis=-1)))) + 1e-30
    dev = np.max(np.linalg.norm(np.asarray(acc_t) - ref, axis=-1))
    assert dev / scale < 1e-5, f"targets-vs-lattice dev {dev/scale:.2e}"


def test_targets_padding_rows_zero():
    bpos, bmass = _bucketed_set(seed=2)
    dead = np.nonzero(np.asarray(bmass).ravel() == 0)[0]
    rows = jnp.asarray(dead[:16], jnp.int32)
    soa = jnp.moveaxis(bpos, -1, 0)
    acc_t = np.asarray(short_range_targets(
        soa, bmass, rows, BOX, 0.9, 0.05, ncell=NCELL, capacity=CAP))
    # dead rows sit at the origin of their cell; their force is whatever
    # the field there is — the invariant that matters is FINITE (no NaN
    # from the self-pair / r=0 guards)
    assert np.all(np.isfinite(acc_t))
