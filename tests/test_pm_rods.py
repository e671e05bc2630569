"""Rod-resident PM kernels (ops/pallas_pm_rods) vs the jnp reference
pipeline (ops/bucketed_pm), in Pallas interpret mode on CPU.

These kernels are the production TPU deposit/gather: deposit is one GEMM
per (cx, cy) rod with global z (no z ghost fold), and the gather fuses
CIC x fd4 straight out of the potential grid (no gradient grids, no
block extraction). Reference parity: the CUDA atomic CIC deposit
(power_spectrum.cu:86-134) and trilinear force gather, rebuilt TPU-first.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.treepm import bucket_particles
from lambda_cdm_tpu.ops import bucketed_pm as bpm
from lambda_cdm_tpu.ops.pallas_pm_rods import (assemble_rods,
                                               pallas_deposit_rods,
                                               pallas_gather_fd4)

N, BOX, NG, NC, CAP, MARGIN = 6000, 10.0, 32, 4, 128, 1


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

@pytest.fixture(scope="module")
def bucketed():
    pos = jax.random.uniform(jax.random.PRNGKey(0), (N, 3), maxval=BOX)
    m = jnp.full((N,), 1.3)
    bpos, bmass, _, ovf = bucket_particles(pos, m, BOX, ncell=NC,
                                           capacity=CAP)
    assert int(ovf) == 0
    return bpos, bmass


class TestDepositRods:
    def test_matches_jnp_deposit(self, bucketed):
        bpos, bmass = bucketed
        grid_ref, drop_ref = bpm.deposit_from_buckets(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN)
        blocks, drop_new = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        grid_new = assemble_rods(blocks, ncell=NC, ng=NG, margin=MARGIN)
        scale = float(jnp.abs(grid_ref).max())
        np.testing.assert_allclose(np.asarray(grid_new),
                                   np.asarray(grid_ref),
                                   atol=1e-5 * scale)
        assert int(drop_new) == int(drop_ref) == 0

    def test_mass_conservation(self, bucketed):
        bpos, bmass = bucketed
        blocks, _ = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        grid = assemble_rods(blocks, ncell=NC, ng=NG, margin=MARGIN)
        total = float(jnp.sum(bmass))
        assert abs(float(grid.sum()) - total) < 1e-5 * total

    def test_counts_margin_drops(self, bucketed):
        bpos, bmass = bucketed
        # teleport one live particle far from its bucket: must be
        # counted, and its mass must vanish from the grid
        bpos2 = bpos.at[0, 0].set(jnp.array([BOX / 2, BOX / 2, BOX / 2]))
        blocks, dropped = pallas_deposit_rods(
            bpos2, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        grid = assemble_rods(blocks, ncell=NC, ng=NG, margin=MARGIN)
        assert int(dropped) == 1
        expect = float(jnp.sum(bmass)) - float(bmass[0, 0])
        assert abs(float(grid.sum()) - expect) < 1e-5 * expect


class TestOccupancyAware:
    """counts-driven kernels (rank-major slots + dynamic chunk trips)
    must match the dense variants bit-for-bit semantics-wise: dead
    padding contributes nothing there, is skipped entirely here."""

    def _counts(self, bmass):
        return jnp.sum(bmass > 0, axis=1).astype(jnp.int32)

    def test_deposit_matches_dense(self, bucketed):
        bpos, bmass = bucketed
        dense, drop_a = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        occ, drop_b = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True, counts=self._counts(bmass))
        ga = assemble_rods(dense, ncell=NC, ng=NG, margin=MARGIN)
        gb = assemble_rods(occ, ncell=NC, ng=NG, margin=MARGIN)
        scale = float(jnp.abs(ga).max())
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=1e-6 * scale)
        assert int(drop_a) == int(drop_b)

    def test_gather_matches_dense(self, bucketed):
        bpos, bmass = bucketed
        phi = jax.random.normal(jax.random.PRNGKey(5), (NG, NG, NG))
        a = pallas_gather_fd4(
            phi, bpos, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        b = pallas_gather_fd4(
            phi, bpos, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True, counts=self._counts(bmass))
        live = np.asarray(bmass) > 0
        scale = float(jnp.abs(a).max())
        d = np.abs(np.asarray(b) - np.asarray(a))[live]
        assert d.max() < 1e-6 * scale
        # slots in chunks past ceil(rodmax*nc/s) are skipped -> exactly 0
        # (dead slots in COMPUTED chunks may gather garbage at the
        # padding position, same as the dense variant: downstream masks
        # by mass). s = 256 at this geometry (s_rod = 512).
        s = 256
        counts = np.asarray(self._counts(bmass)).reshape(NC * NC, NC)
        cut = -(-counts.max(axis=1) * NC // s) * s      # trips * s
        rank_min = -(-cut // NC)
        bb = np.asarray(b).reshape(NC * NC, NC, -1, 3)
        for r in range(NC * NC):
            tail = bb[r, :, rank_min[r]:, :]
            assert tail.size == 0 or np.abs(tail).max() == 0.0

    def test_highly_nonuniform_counts(self):
        """One packed cell, many empties: the dynamic-trip skipping must
        not skip live work (the clustered-state regime the occupancy
        path exists for)."""
        key = jax.random.PRNGKey(7)
        cell = BOX / NC
        # 300 particles in one cell + 50 spread out
        p1 = jax.random.uniform(key, (300, 3), minval=0.1 * cell,
                                maxval=0.9 * cell)
        p2 = jax.random.uniform(jax.random.PRNGKey(8), (50, 3),
                                maxval=BOX)
        pos = jnp.concatenate([p1, p2])
        m = jnp.full((350,), 2.0)
        bpos, bmass, _, ovf = bucket_particles(pos, m, BOX, ncell=NC,
                                               capacity=384)
        assert int(ovf) == 0
        counts = jnp.sum(bmass > 0, axis=1).astype(jnp.int32)
        dense, _ = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        occ, _ = pallas_deposit_rods(
            bpos, bmass, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True, counts=counts)
        ga = assemble_rods(dense, ncell=NC, ng=NG, margin=MARGIN)
        gb = assemble_rods(occ, ncell=NC, ng=NG, margin=MARGIN)
        total = float(jnp.sum(bmass))
        assert abs(float(gb.sum()) - total) < 1e-5 * total
        scale = float(jnp.abs(ga).max())
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                                   atol=1e-6 * scale)
        phi = jax.random.normal(jax.random.PRNGKey(9), (NG, NG, NG))
        a = pallas_gather_fd4(phi, bpos, ncell=NC, ng=NG, box_size=BOX,
                              margin=MARGIN, interpret=True)
        b = pallas_gather_fd4(phi, bpos, ncell=NC, ng=NG, box_size=BOX,
                              margin=MARGIN, interpret=True,
                              counts=counts)
        live = np.asarray(bmass) > 0
        d = np.abs(np.asarray(b) - np.asarray(a))[live]
        assert d.max() < 1e-6 * float(jnp.abs(a).max())


class TestGatherFd4:
    def _fields(self, phi):
        h = BOX / NG
        return jnp.stack([
            -(8.0 * (jnp.roll(phi, -1, ax) - jnp.roll(phi, 1, ax))
              - (jnp.roll(phi, -2, ax) - jnp.roll(phi, 2, ax)))
            / (12.0 * h)
            for ax in range(3)])

    def test_matches_fd4_rolls_plus_gather(self, bucketed):
        bpos, bmass = bucketed
        phi = jax.random.normal(jax.random.PRNGKey(2), (NG, NG, NG))
        acc_ref = bpm.gather_to_buckets(
            self._fields(phi), bpos, bmass, ncell=NC, ng=NG,
            box_size=BOX, margin=MARGIN)
        acc_new = pallas_gather_fd4(
            phi, bpos, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        live = np.asarray(bmass) > 0
        d = np.abs(np.asarray(acc_new) - np.asarray(acc_ref))[live]
        assert d.max() < 1e-5 * float(jnp.abs(acc_ref).max())

    def test_drifted_particles(self, bucketed):
        """Particles drifted within the margin still gather correctly
        (the fast stepper's amortized-rebucket contract)."""
        bpos, bmass = bucketed
        drift = 0.9 * BOX / NG
        bpos2 = jnp.where((bmass > 0)[..., None],
                          (bpos + drift) % BOX, 0.0)
        phi = jax.random.normal(jax.random.PRNGKey(3), (NG, NG, NG))
        acc_ref = bpm.gather_to_buckets(
            self._fields(phi), bpos2, bmass, ncell=NC, ng=NG,
            box_size=BOX, margin=MARGIN)
        acc_new = pallas_gather_fd4(
            phi, bpos2, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        live = np.asarray(bmass) > 0
        d = np.abs(np.asarray(acc_new) - np.asarray(acc_ref))[live]
        assert d.max() < 1e-5 * float(jnp.abs(acc_ref).max())

    def test_smooth_field_gradient(self, bucketed):
        """On an analytic plane wave the gathered force matches the
        analytic -grad phi to fd4+CIC truncation order."""
        bpos, bmass = bucketed
        kx = 2 * jnp.pi / BOX
        # grid sample i sits at (i + 0.5) h (the CIC u - 0.5 convention)
        x = (jnp.arange(NG) + 0.5) * (BOX / NG)
        phi = jnp.sin(kx * x)[:, None, None] * jnp.ones((1, NG, NG))
        acc = pallas_gather_fd4(
            phi, bpos, ncell=NC, ng=NG, box_size=BOX, margin=MARGIN,
            interpret=True)
        live = np.asarray(bmass) > 0
        expect = -kx * np.cos(kx * np.asarray(bpos[..., 0]))
        err = np.abs(np.asarray(acc[..., 0]) - expect)[live]
        # CIC on a kh = 2 pi/32 wave: O((kh)^2) ~ 4e-2 relative
        assert err.max() < 5e-2 * kx
        assert np.abs(np.asarray(acc[..., 1]))[live].max() < 1e-6


class TestUnalignedPpc:
    """ppc = ng/ncell NOT a multiple of 8 (the paired short-range
    geometry at 192^3 gives ppc=6): the gather's y window self-aligns
    to 8-blocks with residual-shifted one-hot indices, and the deposit's
    ell^2 output block stays 8-divisible."""
    NG2, NC2, CAP2 = 48, 8, 32

    @pytest.fixture(scope="class")
    def bucketed6(self):
        pos = jax.random.uniform(jax.random.PRNGKey(9), (4000, 3),
                                 maxval=BOX)
        m = jnp.full((4000,), 0.7)
        bpos, bmass, _, ovf = bucket_particles(
            pos, m, BOX, ncell=self.NC2, capacity=self.CAP2)
        assert int(ovf) == 0
        return bpos, bmass

    def _fields(self, phi):
        h = BOX / self.NG2
        return jnp.stack([
            -(8.0 * (jnp.roll(phi, -1, ax) - jnp.roll(phi, 1, ax))
              - (jnp.roll(phi, -2, ax) - jnp.roll(phi, 2, ax)))
            / (12.0 * h)
            for ax in range(3)])

    def test_gather_ppc6(self, bucketed6):
        bpos, bmass = bucketed6
        phi = jax.random.normal(jax.random.PRNGKey(10),
                                (self.NG2,) * 3)
        acc_ref = bpm.gather_to_buckets(
            self._fields(phi), bpos, bmass, ncell=self.NC2, ng=self.NG2,
            box_size=BOX, margin=MARGIN)
        acc_new = pallas_gather_fd4(
            phi, bpos, ncell=self.NC2, ng=self.NG2, box_size=BOX,
            margin=MARGIN, interpret=True)
        live = np.asarray(bmass) > 0
        d = np.abs(np.asarray(acc_new) - np.asarray(acc_ref))[live]
        assert d.max() < 1e-5 * float(jnp.abs(acc_ref).max())

    def test_gather_ppc6_occupancy(self, bucketed6):
        bpos, bmass = bucketed6
        counts = jnp.sum(bmass > 0, axis=1).astype(jnp.int32)
        phi = jax.random.normal(jax.random.PRNGKey(11),
                                (self.NG2,) * 3)
        a_dense = pallas_gather_fd4(
            phi, bpos, ncell=self.NC2, ng=self.NG2, box_size=BOX,
            margin=MARGIN, interpret=True)
        a_occ = pallas_gather_fd4(
            phi, bpos, ncell=self.NC2, ng=self.NG2, box_size=BOX,
            margin=MARGIN, interpret=True, counts=counts)
        live = np.asarray(bmass) > 0
        d = np.abs(np.asarray(a_occ) - np.asarray(a_dense))[live]
        assert d.max() < 1e-6 * float(jnp.abs(a_dense).max() + 1e-30)

    def test_deposit_ppc6(self, bucketed6):
        bpos, bmass = bucketed6
        grid_ref, drop_ref = bpm.deposit_from_buckets(
            bpos, bmass, ncell=self.NC2, ng=self.NG2, box_size=BOX,
            margin=MARGIN)
        blocks, drop_new = pallas_deposit_rods(
            bpos, bmass, ncell=self.NC2, ng=self.NG2, box_size=BOX,
            margin=MARGIN, interpret=True)
        grid_new = assemble_rods(blocks, ncell=self.NC2, ng=self.NG2,
                                 margin=MARGIN)
        scale = float(jnp.abs(grid_ref).max())
        # 2e-5: the bf16x3 GEMM's documented ~1.5e-5 relative error
        # (_dot_f32) -- measured max 1.2e-5 at this geometry, mass
        # conserved exactly
        np.testing.assert_allclose(np.asarray(grid_new),
                                   np.asarray(grid_ref),
                                   atol=2e-5 * scale)
        assert int(drop_new) == int(drop_ref) == 0
