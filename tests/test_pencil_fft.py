"""2D pencil-decomposed FFT + PM on a (2, 4) CPU mesh (VERDICT item 7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lambda_cdm_tpu.parallel.mesh import make_mesh2d
from lambda_cdm_tpu.parallel import fft as dfft


@pytest.fixture(scope="module")
def mesh2d(cpu_devices):
    return make_mesh2d((2, 4))


@pytest.fixture(scope="module")
def grid(mesh2d):
    ng = 32
    g = jax.random.normal(jax.random.PRNGKey(0), (ng, ng, ng))
    return jax.device_put(g, NamedSharding(mesh2d, P("shx", "shy", None)))


class TestPencilFFT:
    def test_forward_matches_rfftn(self, mesh2d, grid):
        ng = grid.shape[0]
        gk = dfft.pencil_rfftn(grid, mesh=mesh2d)
        ref = jnp.fft.rfftn(grid)
        nzr = ng // 2 + 1
        np.testing.assert_allclose(np.asarray(gk)[:, :, :nzr],
                                   np.asarray(ref), atol=2e-3)

    def test_roundtrip(self, mesh2d, grid):
        ng = grid.shape[0]
        gk = dfft.pencil_rfftn(grid, mesh=mesh2d)
        back = dfft.pencil_irfftn(gk, ng=ng, mesh=mesh2d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(grid),
                                   atol=1e-5)

    def test_sharding_layout(self, mesh2d, grid):
        gk = dfft.pencil_rfftn(grid, mesh=mesh2d)
        # ky sharded over shx, kz over shy, kx full
        ng = grid.shape[0]
        assert gk.shape[0] == ng
        assert gk.shape[1] == ng
        zp = gk.shape[2]
        assert zp >= ng // 2 + 1 and zp % 4 == 0

    def test_poisson_matches_single_device(self, mesh2d, grid):
        ng = grid.shape[0]
        rho = grid - jnp.mean(grid)
        phi = dfft.pencil_poisson_solve(rho, ng=ng, box_size=50.0,
                                        mesh=mesh2d)
        # single-device reference
        from lambda_cdm_tpu.physics.initial_conditions import fourier_grid
        kx, ky, kz, k2 = fourier_grid(ng, 50.0)
        inv = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
        ref = jnp.fft.irfftn(-4.0 * jnp.pi * inv * jnp.fft.rfftn(rho),
                             s=(ng, ng, ng))
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(phi), np.asarray(ref),
                                   atol=1e-5 * scale)


class TestPencilPM:
    def test_sharded_pm_on_2d_mesh(self, mesh2d):
        """GSPMD PM accelerations with particles sharded over the
        flattened 2D device grid match the single-device solver."""
        from lambda_cdm_tpu.forces.pm import pm_accelerations
        n, box, ng = 2048, 50.0, 32
        key = jax.random.PRNGKey(1)
        pos = jax.random.uniform(key, (n, 3), maxval=box)
        m = jnp.ones((n,))
        ref = pm_accelerations(pos, m, ng, box, 1.0)
        ps = NamedSharding(mesh2d, P(("shx", "shy")))
        pos_s = jax.device_put(pos, ps)
        m_s = jax.device_put(m, ps)

        @jax.jit
        def sharded(p, mm):
            p = jax.lax.with_sharding_constraint(p, ps)
            mm = jax.lax.with_sharding_constraint(mm, ps)
            return pm_accelerations(p, mm, ng, box, 1.0)

        acc = sharded(pos_s, m_s)
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(np.asarray(acc), np.asarray(ref),
                                   atol=1e-4 * scale)
