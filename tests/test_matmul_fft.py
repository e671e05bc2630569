"""MXU DFT-by-matmul transforms vs jnp.fft (exactness + round trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.ops import matmul_fft as mf


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.mark.parametrize("shape", [(16, 16, 16), (32, 16, 8),
                                   (24, 24, 24), (33, 18, 15)])
def test_rfftn_matches_numpy(shape):
    key = jax.random.PRNGKey(sum(shape))
    x = jax.random.normal(key, shape, jnp.float32)
    ref = np.fft.rfftn(np.asarray(x, np.float64))
    got = np.asarray(mf.rfftn_mm(x))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("shape", [(16, 16, 16), (32, 16, 8),
                                   (24, 24, 24), (33, 18, 15)])
def test_irfftn_matches_numpy(shape):
    key = jax.random.PRNGKey(sum(shape) + 1)
    xk = (jax.random.normal(key, (shape[0], shape[1], shape[2] // 2 + 1))
          + 1j * jax.random.normal(jax.random.PRNGKey(2),
                                   (shape[0], shape[1],
                                    shape[2] // 2 + 1))).astype(
        jnp.complex64)
    ref = np.fft.irfftn(np.asarray(xk), s=shape, axes=(0, 1, 2))
    got = np.asarray(mf.irfftn_mm(xk, shape))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-5 * scale)


def test_round_trip():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (32, 32, 32), jnp.float32)
    back = mf.irfftn_mm(mf.rfftn_mm(x), (32, 32, 32))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_jit_and_grad_compatible():
    """The transforms are traceable (pure GEMMs): jit + vjp both work."""
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 16, 16), jnp.float32)

    @jax.jit
    def power(x):
        k = mf.rfftn_mm(x)
        return jnp.sum(jnp.abs(k) ** 2)

    p, g = jax.value_and_grad(power)(x)
    # Parseval: sum |X_k|^2 relates to n^3 sum x^2 with Hermitian halves;
    # just check finite + nonzero and the gradient has the right shape
    assert np.isfinite(float(p)) and float(p) > 0
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_dispatch_cpu_falls_back():
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 8, 8), jnp.float32)
    a = np.asarray(mf.rfftn(x))
    b = np.asarray(jnp.fft.rfftn(x))
    np.testing.assert_allclose(a, b, atol=1e-5)
