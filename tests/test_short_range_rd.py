"""Tests for the rod-dense short-range kernel (ops/pallas_short_range_rd):
packing invariants, window-table coverage, and interpreter-mode agreement
with the exact-erfc dense oracle (same 1e-3 bar as the vpu3 kernel test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.forces.direct import min_image
from lambda_cdm_tpu.forces.treepm import short_range_factor
from lambda_cdm_tpu.ops import pallas_short_range_rd as rd

pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

BOX = 64.0
NCELL = 4
RS = 2.0          # r_cut = 4.5*rs = 9 <= cell = 16
R_CUT = 4.5 * RS
SOFT = 0.1


def _dense_oracle(pos, m, box, rs, soft):
    """All-pairs exact-erfc short-range accelerations (f64 via f32 jnp)."""
    d = min_image(pos[None, :, :] - pos[:, None, :], box)
    r2 = jnp.sum(d * d, axis=-1) + soft * soft
    r = jnp.sqrt(r2)
    w = m[None, :] * short_range_factor(r, rs) / (r2 * r)
    w = w * (1.0 - jnp.eye(pos.shape[0]))
    return jnp.sum(w[..., None] * d, axis=1)


def _slots_to_particles(acc_slots, src, n):
    flat = acc_slots.reshape(-1, 3)
    tgt = jnp.where(src < n, src, n)
    return jnp.zeros((n + 1, 3), flat.dtype).at[tgt].set(flat)[:n]


def _make(key, n, *, blob=False, edges=False, n_dead=64):
    kp, km, kb = jax.random.split(key, 3)
    pos = jax.random.uniform(kp, (n, 3), maxval=BOX)
    if blob:
        nb = n // 4
        center = jnp.array([BOX / 2, BOX / 2, BOX / 2])
        pos = pos.at[:nb].set(
            center + 1.5 * jax.random.normal(kb, (nb, 3)))
        pos = jnp.mod(pos, BOX)
    if edges:
        # push half the particles into thin z slabs at both box faces so
        # every rod exercises the wrap segments
        nb = n // 2
        z = jnp.where(jnp.arange(nb) % 2 == 0,
                      jax.random.uniform(kb, (nb,), maxval=0.05 * BOX),
                      BOX - jax.random.uniform(kb, (nb,),
                                               maxval=0.05 * BOX))
        pos = pos.at[:nb, 2].set(z)
    m = jax.random.uniform(km, (n,), minval=0.5, maxval=2.0)
    if n_dead:
        m = m.at[-n_dead:].set(0.0)   # inert padding rows
    return pos, m


class TestRodPacking:
    def test_pack_invariants(self):
        n = 2048
        pos, m = _make(jax.random.PRNGKey(0), n)
        k_rod = rd.rd_geometry(n, NCELL)
        rpos, rmass, counts, rzq, overflow, src = rd.rd_pack(
            pos, m, BOX, ncell=NCELL, k_rod=k_rod)
        assert int(overflow) == 0
        n_live = int(jnp.sum(m > 0))
        assert int(jnp.sum(counts)) == n_live
        assert int(jnp.sum(rmass > 0)) == n_live
        # z-sorted live-first within every rod
        zq = np.asarray(rzq)
        cnt = np.asarray(counts)
        for r in range(NCELL * NCELL):
            c = cnt[r]
            assert np.all(np.diff(zq[r, :c]) >= 0), f"rod {r} not sorted"
            assert np.all(zq[r, c:] == zq.max()), f"rod {r} live-first"
        # src maps each live slot to the particle that belongs there
        src_np = np.asarray(src).reshape(NCELL * NCELL, k_rod)
        pos_np = np.asarray(pos)
        cell = np.clip((pos_np / BOX * NCELL).astype(int), 0, NCELL - 1)
        rod_of = cell[:, 0] * NCELL + cell[:, 1]
        for r in range(NCELL * NCELL):
            rows = src_np[r, :cnt[r]]
            assert np.all(rows < n)
            assert np.all(rod_of[rows] == r)

    def test_window_tables_cover_rcut(self):
        """Every live pair within r_cut in z (and +-1 rod in x/y) lands in
        some table segment of the i particle's chunk."""
        n = 1024
        pos, m = _make(jax.random.PRNGKey(1), n, edges=True)
        k_rod = rd.rd_geometry(n, NCELL)
        rpos, rmass, counts, rzq, overflow, src = rd.rd_pack(
            pos, m, BOX, ncell=NCELL, k_rod=k_rod)
        tables = rd.rd_window_tables(rzq, counts, ncell=NCELL,
                                     k_rod=k_rod, box_size=BOX,
                                     window=R_CUT)
        tbl = np.asarray(tables)          # [R, NCH, 27]
        zq = np.asarray(rzq).astype(np.int64)
        cnt = np.asarray(counts)
        zb = rd._zbits(NCELL)
        qmax = (1 << zb) - 1
        scale = float(1 << zb) / BOX
        nch = k_rod // rd._CH
        nrods = NCELL * NCELL
        for r in range(nrods):
            cx, cy = divmod(r, NCELL)
            for t in range(min(nch, (cnt[r] + rd._CH - 1) // rd._CH)):
                rows = zq[r, t * rd._CH:(t + 1) * rd._CH]
                rows = rows[rows <= qmax]
                if rows.size == 0:
                    continue
                for e in range(27):
                    nbr_idx = e // 3
                    dx, dy = divmod(nbr_idx, 3)
                    nb = (((cx + dx - 1) % NCELL) * NCELL
                          + (cy + dy - 1) % NCELL)
                    ent = tbl[r, t, e]
                    zsel, nt, st = ent % 4, (ent // 4) % 256, ent // 1024
                    covered = set(range(st * 128,
                                        min((st + nt) * 128, k_rod)))
                    # check every live j in this neighbor rod within the
                    # quantized window for this segment is covered
                    shift = {0: 0, 1: 1 << zb, 2: -(1 << zb)}[zsel]
                    wq = int(np.ceil(R_CUT * scale)) + 1
                    zlo, zhi = rows.min() - wq, rows.max() + wq
                    for j in range(cnt[nb]):
                        zj = zq[nb, j] + shift
                        in_seg = (zlo <= zj <= zhi) and (
                            (zsel == 0 and 0 <= zq[nb, j] <= qmax)
                            or (zsel == 1 and zhi > qmax)
                            or (zsel == 2 and zlo < 0))
                        if in_seg and zsel != 0:
                            assert j in covered, (
                                f"rod {r} chunk {t} nbr {nb} zsel {zsel}: "
                                f"slot {j} (zq {zq[nb, j]}) uncovered")


class TestRodKernel:
    @pytest.mark.parametrize("scenario", ["uniform", "blob", "edges"])
    def test_matches_dense_oracle(self, scenario):
        n = 1536
        pos, m = _make(jax.random.PRNGKey(2),
                       n, blob=scenario == "blob",
                       edges=scenario == "edges")
        k_rod = rd.rd_geometry(n, NCELL)
        rpos, rmass, counts, rzq, overflow, src = rd.rd_pack(
            pos, m, BOX, ncell=NCELL, k_rod=k_rod)
        assert int(overflow) == 0
        tables = rd.rd_window_tables(rzq, counts, ncell=NCELL,
                                     k_rod=k_rod, box_size=BOX,
                                     window=R_CUT)
        acc = rd.pallas_short_range_rd(
            rpos, rmass, counts, tables, ncell=NCELL, k_rod=k_rod,
            box_size=BOX, rs=RS, softening=SOFT, interpret=True)
        got = _slots_to_particles(acc, src, n)
        ref = _dense_oracle(pos, m, BOX, RS, SOFT)
        scale = float(jnp.max(jnp.abs(ref)))
        live = (m > 0)[:, None]
        diff = jnp.where(live, jnp.abs(got - ref), 0.0)
        assert float(jnp.max(diff)) / scale < 1e-3, scenario
