"""Tests for the scatter-free bucketed PM ops and the fast TreePM stepper:
exact agreement with the scatter-based reference implementations, drift
accounting, re-bucketing invariants, and the Pallas short-range kernel in
interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.analysis.power_spectrum import cic_deposit
from lambda_cdm_tpu.forces.pm import cic_gather, pm_accelerations
from lambda_cdm_tpu.forces.treepm import (bucket_particles,
                                          short_range_bucketed,
                                          short_range_factor,
                                          short_range_factor_poly,
                                          treepm_accelerations)
from lambda_cdm_tpu.ops import bucketed_pm as bp
from lambda_cdm_tpu.ops.fast_treepm import (build_fast_state, fast_plan,
                                            fast_run, flatten_fast_state,
                                            initialize_fast)
from lambda_cdm_tpu.ops.pallas_short_range import pallas_short_range
from lambda_cdm_tpu.physics.cosmology import CosmologyParams

pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

PARAMS = CosmologyParams()


@pytest.fixture(scope="module")
def bucketed():
    key = jax.random.PRNGKey(0)
    n, box, ng, ncell = 4096, 64.0, 32, 8
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=0.5,
                           maxval=2.0)
    bpos, bmass, pslot, ovf = bucket_particles(pos, m, box, ncell=ncell,
                                               capacity=32)
    assert int(ovf) == 0
    return dict(pos=pos, m=m, box=box, ng=ng, ncell=ncell, cap=32,
                bpos=bpos, bmass=bmass, pslot=pslot)


class TestBucketedDeposit:
    def test_matches_scatter_cic(self, bucketed):
        b = bucketed
        ref = cic_deposit(b["pos"], b["ng"], b["box"], b["m"])
        grid, dropped = bp.deposit_from_buckets(
            b["bpos"], b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"])
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                                   atol=1e-5)

    def test_mass_conservation(self, bucketed):
        b = bucketed
        grid, _ = bp.deposit_from_buckets(
            b["bpos"], b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"])
        assert float(grid.sum()) == pytest.approx(float(b["m"].sum()),
                                                  rel=1e-5)

    def test_drift_beyond_margin_counted(self, bucketed):
        b = bucketed
        # shift all particles by 2 PM cells (> margin=1): every live
        # particle drops from the deposit
        shift = 2.1 * b["box"] / b["ng"]
        bpos = jnp.where((b["bmass"] > 0)[..., None],
                         jnp.mod(b["bpos"] + shift, b["box"]), 0.0)
        grid, dropped = bp.deposit_from_buckets(
            bpos, b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"])
        assert int(dropped) > 0

    def test_gather_matches_scatter(self, bucketed):
        b = bucketed
        field = jax.random.normal(jax.random.PRNGKey(2),
                                  (b["ng"],) * 3)
        ref = cic_gather(field, b["pos"], b["ng"], b["box"])
        vals = bp.gather_to_buckets(field, b["bpos"], b["bmass"],
                                    ncell=b["ncell"], ng=b["ng"],
                                    box_size=b["box"])
        np.testing.assert_allclose(
            np.asarray(vals.reshape(-1)[b["pslot"]]), np.asarray(ref),
            atol=1e-5)

    def test_gather_multi_field(self, bucketed):
        b = bucketed
        fields = jax.random.normal(jax.random.PRNGKey(3),
                                   (3, b["ng"], b["ng"], b["ng"]))
        vals = bp.gather_to_buckets(fields, b["bpos"], b["bmass"],
                                    ncell=b["ncell"], ng=b["ng"],
                                    box_size=b["box"])
        assert vals.shape[-1] == 3
        one = bp.gather_to_buckets(fields[1], b["bpos"], b["bmass"],
                                   ncell=b["ncell"], ng=b["ng"],
                                   box_size=b["box"])
        np.testing.assert_allclose(np.asarray(vals[..., 1]),
                                   np.asarray(one), atol=1e-6)

    def test_pm_bucketed_matches_scatter_pm(self, bucketed):
        b = bucketed
        ref = pm_accelerations(b["pos"], b["m"], b["ng"], b["box"],
                               split_scale=2.0)
        acc, _ = bp.pm_accelerations_bucketed(
            b["bpos"], b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"], split_scale=2.0, gradient="spectral")
        scale = float(jnp.max(jnp.abs(ref)))
        diff = np.asarray(acc.reshape(-1, 3)[b["pslot"]]) - np.asarray(ref)
        assert np.max(np.abs(diff)) / scale < 1e-5

    def test_fd4_close_to_spectral(self, bucketed):
        b = bucketed
        a1, _ = bp.pm_accelerations_bucketed(
            b["bpos"], b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"], split_scale=2.0, gradient="spectral")
        a2, _ = bp.pm_accelerations_bucketed(
            b["bpos"], b["bmass"], ncell=b["ncell"], ng=b["ng"],
            box_size=b["box"], split_scale=2.0, gradient="fd4")
        scale = float(jnp.max(jnp.abs(a1)))
        assert float(jnp.max(jnp.abs(a1 - a2))) / scale < 0.05


class TestShortRangePoly:
    def test_poly_matches_exact(self):
        r = jnp.linspace(1e-3, 5.9, 500)
        rs = 1.0
        exact = short_range_factor(r, rs)
        poly = short_range_factor_poly(r, rs)
        np.testing.assert_allclose(np.asarray(poly), np.asarray(exact),
                                   atol=5e-4)

    def test_pallas_kernel_interpret(self, bucketed):
        """Default (vpu3) kernel vs the exact-erfc jnp reference: the
        residual is the cutoff truncation (S(x_max) = 2.2e-5 per pair)
        plus the even-polynomial fit error (2.15e-5 vs a float64 oracle,
        ops/pallas_short_range._poly_even_coeffs)."""
        b = bucketed
        rs, soft = 2.0, 0.1
        ref = short_range_bucketed(b["bpos"], b["bmass"], b["box"], rs,
                                   soft, ncell=b["ncell"],
                                   capacity=b["cap"], use_poly=False)
        out = pallas_short_range(b["bpos"], b["bmass"], ncell=b["ncell"],
                                 capacity=b["cap"], box_size=b["box"],
                                 rs=rs, softening=soft, interpret=True)
        scale = float(jnp.max(jnp.abs(ref)))
        # dead (zero-mass padding) slots carry don't-care values: the
        # kernel's per-rod unwrap gives them different garbage than the
        # jnp reference's min-image; both are masked downstream
        live = (b["bmass"] > 0)[..., None]
        diff = jnp.where(live, jnp.abs(out - ref), 0.0)
        assert float(jnp.max(diff)) / scale < 1e-3

    def test_pallas_v1_matches_poly_oracle(self, bucketed):
        """The legacy vpu variant still matches the x-space poly path
        bit-tight (they share the polynomial)."""
        b = bucketed
        rs, soft = 2.0, 0.1
        ref = short_range_bucketed(b["bpos"], b["bmass"], b["box"], rs,
                                   soft, ncell=b["ncell"],
                                   capacity=b["cap"], use_poly=True)
        out = pallas_short_range(b["bpos"], b["bmass"], ncell=b["ncell"],
                                 capacity=b["cap"], box_size=b["box"],
                                 rs=rs, softening=soft, interpret=True,
                                 variant="vpu")
        scale = float(jnp.max(jnp.abs(ref)))
        live = (b["bmass"] > 0)[..., None]
        diff = jnp.where(live, jnp.abs(out - ref), 0.0)
        assert float(jnp.max(diff)) / scale < 1e-5

    def test_pallas_v4_matches_oracle(self, bucketed):
        """The paired-z-cell variant (capacity 64, two cells per 128-lane
        row) agrees with the exact-erfc reference at the vpu3 bar,
        including the z-wrap halo rows."""
        b = bucketed
        rs, soft = 2.0, 0.1
        bpos, bmass, pslot, ovf = bucket_particles(
            b["pos"], b["m"], b["box"], ncell=b["ncell"], capacity=64)
        assert int(ovf) == 0
        ref = short_range_bucketed(bpos, bmass, b["box"], rs, soft,
                                   ncell=b["ncell"], capacity=64,
                                   use_poly=False)
        for variant, ch in (("vpu4", 8), ("vpu4", 16), ("vpu4b", 16)):
            out = pallas_short_range(bpos, bmass, ncell=b["ncell"],
                                     capacity=64, box_size=b["box"],
                                     rs=rs, softening=soft,
                                     interpret=True, variant=variant,
                                     i_chunk=ch)
            scale = float(jnp.max(jnp.abs(ref)))
            live = (bmass > 0)[..., None]
            diff = jnp.where(live, jnp.abs(out - ref), 0.0)
            assert float(jnp.max(diff)) / scale < 1e-3, \
                f"{variant} ch={ch}"

    def test_pallas_v3_matches_v2(self, bucketed):
        """The occupancy-aware dynamic-chunk variant agrees with the
        fixed-shape vpu2 kernel on live slots (dead slots: vpu3 returns
        exact zeros past the live count, vpu2 garbage -- both masked
        downstream)."""
        b = bucketed
        rs, soft = 2.0, 0.1
        a2 = pallas_short_range(b["bpos"], b["bmass"], ncell=b["ncell"],
                                capacity=b["cap"], box_size=b["box"],
                                rs=rs, softening=soft, interpret=True,
                                variant="vpu2")
        a3 = pallas_short_range(b["bpos"], b["bmass"], ncell=b["ncell"],
                                capacity=b["cap"], box_size=b["box"],
                                rs=rs, softening=soft, interpret=True,
                                variant="vpu3")
        scale = float(jnp.max(jnp.abs(a2)))
        live = (b["bmass"] > 0)[..., None]
        diff = jnp.where(live, jnp.abs(a3 - a2), 0.0)
        assert float(jnp.max(diff)) / scale < 5e-4


class TestFastStepper:
    def test_plan_constraints(self):
        plan = fast_plan(1_000_000, 100.0, 256)
        assert 256 % plan["ncell"] == 0
        # standard plans quantize capacity to 128; the paired-z-cell
        # variant runs two 64-slot cells per 128-lane row
        if plan["variant"] == "vpu4b":
            assert plan["capacity"] == 64 and plan["ncell"] % 2 == 0
        else:
            assert plan["capacity"] % 128 == 0
        assert 100.0 / plan["ncell"] >= plan["r_cut"]

    def test_plan_paired_selection(self):
        """The paired kernel engages exactly when occupancy fits 64
        slots/cell (and the grown-capacity retry falls back)."""
        p = fast_plan(1_000_000, 100.0, 256, align_ncell=True)
        assert (p["ncell"], p["capacity"], p["variant"]) == \
            (32, 64, "vpu4b")
        # 10M @ 448^3: occupancy 57 needs 1.75x headroom > 64 -> vpu3
        p = fast_plan(10_000_000, 100.0, 448, align_ncell=True)
        assert p["variant"] == "vpu3" and p["capacity"] % 128 == 0
        # explicit grown capacity (overflow retry) falls back to vpu3
        p = fast_plan(1_000_000, 100.0, 256, align_ncell=True,
                      capacity=128)
        assert p["variant"] == "vpu3" and p["capacity"] == 128

    def test_force_agreement_with_stateless(self, bucketed):
        b = bucketed
        fstate, kw = initialize_fast(
            b["pos"], jnp.zeros_like(b["pos"]), b["m"], 0.1,
            box_size=b["box"], pm_grid=b["ng"], softening=0.1, g_const=1.0)
        assert int(fstate.dropped) == 0
        ref = treepm_accelerations(b["pos"], b["m"], b["box"],
                                   pm_grid=b["ng"], softening=0.1,
                                   g_const=1.0)
        fpos, _, fmass = flatten_fast_state(fstate)
        live = np.asarray(fmass) > 0

        def keyed(p, a):
            idx = np.lexsort(np.asarray(p).T)
            return np.asarray(a)[idx]

        a1 = keyed(b["pos"], ref)
        a2 = keyed(np.asarray(fpos)[live],
                   np.asarray(fstate.acc.reshape(-1, 3))[live])
        assert np.max(np.abs(a1 - a2)) / np.max(np.abs(a1)) < 1e-3

    def test_run_conserves_mass_and_rebuckets(self, bucketed):
        b = bucketed
        fstate, kw = initialize_fast(
            b["pos"], jnp.zeros_like(b["pos"]), b["m"], 0.1,
            box_size=b["box"], pm_grid=b["ng"], softening=0.1, g_const=1.0)
        fs = fast_run(fstate, PARAMS, 1e-5, n_steps=20, rebucket_every=8,
                      **kw)
        assert float(fs.bmass.sum()) == pytest.approx(
            float(b["m"].sum()), rel=1e-5)
        assert int(fs.step) == 20
        assert int(fs.overflow) == 0
        assert int(fs.dropped) == 0
        assert float(fs.scale_factor) > 0.1
        assert bool(jnp.all(jnp.isfinite(fs.bpos)))

    def test_matches_engine_trajectory(self, bucketed):
        """fast_run == stateless-treepm engine loop on the same ICs
        (statistically: total KE after N steps)."""
        from lambda_cdm_tpu.physics.integrators import kdk_step_fused
        from lambda_cdm_tpu.core.state import make_state
        b = bucketed
        n_steps, dt = 10, 1e-5

        def accel(st):
            return treepm_accelerations(st.positions, st.masses, b["box"],
                                        pm_grid=b["ng"], softening=0.1,
                                        g_const=1.0)

        st = make_state(b["pos"], jnp.zeros_like(b["pos"]), b["m"],
                        scale_factor=0.1)
        acc = accel(st)
        for _ in range(n_steps):
            st, acc = kdk_step_fused(st, acc, accel, PARAMS, dt, b["box"])
        ke_ref = float(jnp.sum(b["m"][:, None] * st.velocities ** 2))

        fstate, kw = initialize_fast(
            b["pos"], jnp.zeros_like(b["pos"]), b["m"], 0.1,
            box_size=b["box"], pm_grid=b["ng"], softening=0.1, g_const=1.0)
        fs = fast_run(fstate, PARAMS, dt, n_steps=n_steps,
                      rebucket_every=100, **kw)
        ke_fast = float(jnp.sum(fs.bmass[..., None] * fs.bvel ** 2))
        assert ke_fast == pytest.approx(ke_ref, rel=5e-3)


class TestBucketOverflowGrowth:
    def test_engine_grows_capacity_losslessly(self):
        """Clustering past the static bucket capacity triggers the
        engine's grow-and-retry (re-plan with doubled capacity from the
        intact pre-rebucket state): no particles are lost, unlike the
        counted-drop fallback."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        n, box = 600, 30.0
        key = jax.random.PRNGKey(8)
        pos = jax.random.uniform(key, (n, 3), maxval=box)
        # velocities that collapse everything into the box center within
        # ~8 steps (dt = 1, Newtonian: no comoving factors)
        vel = (box / 2.0 - pos) * 0.118
        mass = jnp.full((n,), 1e-6)      # gravity negligible

        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = box
        cfg.forces.type = "treepm_fast"
        cfg.forces.pm_grid_size = 24
        cfg.forces.softening_length = 1.0
        cfg.forces.rebucket_every = 8
        cfg.cosmology.model = "Newtonian"
        cfg.cosmology.final_redshift = -0.5   # a-stop must not fire at a=1
        cfg.time.initial_timestep = 1.0
        cfg.time.final_time = 1e9
        cfg.units.system = "box"
        cfg.units.G = 1e-8
        cfg.simulation.output_frequency = 16
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""

        eng = SimulationEngine(cfg)
        eng.initialize(state=make_state(pos, vel, mass, scale_factor=1.0))
        cap0 = eng._fast_kw["capacity"]
        # this geometry auto-plans the paired-z-cell kernel, so the
        # growth must ALSO fall back to the vpu3 layout (vpu4b packs
        # two 64-slot cells per 128-lane row; round-4 fix — the 1M
        # science run crashed here when clustering outgrew capacity 64)
        assert eng._fast_kw["variant"] == "vpu4b"
        eng.run(num_steps=16)

        assert eng._fast_kw["capacity"] > cap0, \
            "capacity did not grow despite total collapse"
        assert eng._fast_kw["variant"] == "vpu3", \
            "grown capacity kept the capacity-64-only paired kernel"
        live = np.asarray(eng.state.masses) > 0
        assert int(live.sum()) == n, \
            f"lost {n - int(live.sum())} particles to bucket overflow"


class TestAdaptiveRebucketCadence:
    def test_drops_halve_the_cadence(self):
        """A chunk that drops deposits (drift beyond the block margin)
        halves the engine's rebucket cadence so later chunks
        self-correct instead of warning forever."""
        from lambda_cdm_tpu.core.config import SimulationConfig
        from lambda_cdm_tpu.core.engine import SimulationEngine
        from lambda_cdm_tpu.core.state import make_state

        n, box = 512, 32.0
        key = jax.random.PRNGKey(9)
        pos = jax.random.uniform(key, (n, 3), maxval=box)
        # uniform streaming: ~0.6 PM cells per step -> safely inside the
        # margin over <=2 steps, far beyond it over a 16-step segment
        vel = jnp.tile(jnp.asarray([[0.8, 0.3, 0.0]]), (n, 1))
        mass = jnp.full((n,), 1e-6)

        cfg = SimulationConfig()
        cfg.particles.num_particles = n
        cfg.particles.box_size = box
        cfg.forces.type = "treepm_fast"
        cfg.forces.pm_grid_size = 24
        cfg.forces.softening_length = 1.0
        cfg.forces.rebucket_every = 16
        cfg.cosmology.model = "Newtonian"
        cfg.cosmology.final_redshift = -0.5
        cfg.time.initial_timestep = 1.0
        cfg.time.final_time = 1e9
        cfg.units.system = "box"
        cfg.units.G = 1e-8
        cfg.simulation.output_frequency = 16
        cfg.simulation.checkpoint_frequency = 0
        cfg.profiling.output_file = ""

        eng = SimulationEngine(cfg)
        eng.initialize(state=make_state(pos, vel, mass, scale_factor=1.0))
        eng.run(num_steps=16)
        assert int(eng._fstate.dropped) > 0, "setup should drop deposits"
        assert getattr(eng, "_fast_rebucket_every", 16) < 16

        drops_before = int(eng._fstate.dropped)
        cadence = eng._fast_rebucket_every
        # keep running: cadence keeps halving until drops stop
        for _ in range(4):
            eng.run(num_steps=16)
            if int(eng._fstate.dropped) == drops_before:
                break
            drops_before = int(eng._fstate.dropped)
        assert eng._fast_rebucket_every <= cadence
        final_drops = int(eng._fstate.dropped)
        eng.run(num_steps=16)
        assert int(eng._fstate.dropped) == final_drops, \
            "cadence adaptation should eliminate drops"


class TestNextRebucketOffset:
    def test_matches_fast_run_loop(self):
        """The closed form must track fast_run's internal cadence for
        every (offset, n, rebucket_every) -- including offsets beyond
        the cadence, which adaptive-cadence halving produces."""
        from lambda_cdm_tpu.ops.fast_treepm import next_rebucket_offset

        def simulate(since, n, r):
            remaining = n
            since = max(0, since)
            while remaining > 0:
                if since >= r:
                    since = 0
                seg = min(r - since, remaining)
                remaining -= seg
                since += seg
            return since

        for r in (1, 2, 4, 8, 16):
            for since in range(0, 2 * r + 2):
                for n in (1, 2, r - 1, r, r + 1, 3 * r, 50):
                    if n <= 0:
                        continue
                    assert next_rebucket_offset(since, n, r) == \
                        simulate(since, n, r), (since, n, r)


class TestPallasV5Windowed:
    """The occupancy-WINDOWED variant for grown capacities (vpu5): rod
    DMA chunks bounded by per-rod max occupancy, per-neighbor-cell j
    chunks bounded by that cell's live count. Must agree with vpu3 on
    live slots at any capacity, on clustered (very uneven occupancy)
    buckets in particular (VERDICT r3: the 1M science run's capacity
    ladder made vpu3 pay capacity-squared for ~constant live pairs)."""

    @staticmethod
    def _clustered_buckets(cap=256, ncell=4, box=20.0, seed=0):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        blob = jnp.array([2.5, 2.5, 2.5]) \
            + 0.8 * jax.random.normal(k1, (200, 3))
        unif = jax.random.uniform(k2, (500, 3), maxval=box)
        pos = jnp.mod(jnp.concatenate([blob, unif]), box)
        n = pos.shape[0]
        mass = jnp.concatenate([jnp.ones((n - 7,)), jnp.zeros((7,))])
        bpos, bmass, _, ovf = bucket_particles(pos, mass, box,
                                               ncell=ncell, capacity=cap)
        assert int(ovf) == 0
        return bpos, bmass, box, ncell, cap

    def test_matches_vpu3_clustered(self):
        bpos, bmass, box, ncell, cap = self._clustered_buckets()
        rs, soft = 1.0, 0.1
        ref = pallas_short_range(bpos, bmass, ncell=ncell, capacity=cap,
                                 box_size=box, rs=rs, softening=soft,
                                 interpret=True, variant="vpu3")
        out = pallas_short_range(bpos, bmass, ncell=ncell, capacity=cap,
                                 box_size=box, rs=rs, softening=soft,
                                 interpret=True, variant="vpu5")
        scale = float(jnp.max(jnp.abs(ref)))
        live = (bmass > 0)[..., None]
        diff = jnp.where(live, jnp.abs(out - ref), 0.0)
        assert float(jnp.max(diff)) / scale < 1e-5

    def test_matches_exact_reference(self):
        bpos, bmass, box, ncell, cap = self._clustered_buckets(seed=3)
        rs, soft = 1.5, 0.1
        ref = short_range_bucketed(bpos, bmass, box, rs, soft,
                                   ncell=ncell, capacity=cap,
                                   use_poly=False)
        out = pallas_short_range(bpos, bmass, ncell=ncell, capacity=cap,
                                 box_size=box, rs=rs, softening=soft,
                                 interpret=True, variant="vpu5")
        scale = float(jnp.max(jnp.abs(ref)))
        live = (bmass > 0)[..., None]
        diff = jnp.where(live, jnp.abs(out - ref), 0.0)
        assert float(jnp.max(diff)) / scale < 1e-3

    def test_rejects_unaligned_capacity(self):
        bpos, bmass, box, ncell, _ = self._clustered_buckets(cap=256)
        with pytest.raises(ValueError, match="vpu5"):
            pallas_short_range(bpos[:, :64], bmass[:, :64], ncell=ncell,
                               capacity=64, box_size=box, rs=1.0,
                               softening=0.1, interpret=True,
                               variant="vpu5")

    def test_plan_selects_vpu5_above_128(self):
        from lambda_cdm_tpu.ops.fast_treepm import fast_plan
        plan = fast_plan(64_000, 62.5, 64, capacity=256,
                         align_ncell=False)
        assert plan["variant"] == "vpu5"
        plan2 = fast_plan(64_000, 62.5, 64, capacity=128,
                          align_ncell=False)
        assert plan2["variant"] in ("vpu3", "vpu4b")


class TestSoALayout:
    """SoA [3, C, K] bucket layout (round 4): AoS [.., .., 3]-minor
    arrays can make XLA materialize (8,128)-tiled relayout copies whose
    minor dim pads 42x (29 GB OOM at the 1M/cap-4096 science geometry).
    The kernels accept both layouts and must agree bitwise."""

    def _buckets(self, cap=256, ncell=4, box=25.0, n=3000):
        pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                                 maxval=box)
        mass = jnp.ones((n,))
        bpos, bmass, _, ovf = bucket_particles(pos, mass, box,
                                               ncell=ncell, capacity=cap)
        assert int(ovf) == 0
        soa = jnp.stack([bpos[..., k] for k in range(3)])
        return bpos, soa, bmass, box, ncell, cap

    def test_short_range_soa_matches_aos(self):
        bpos, soa, bmass, box, ncell, cap = self._buckets()
        kw = dict(ncell=ncell, capacity=cap, box_size=box, rs=1.0,
                  softening=0.1, interpret=True, variant="vpu5")
        a = pallas_short_range(bpos, bmass, **kw)
        s = pallas_short_range(soa, bmass, **kw)
        assert s.shape == (3,) + bpos.shape[:2]
        np.testing.assert_array_equal(np.asarray(jnp.moveaxis(s, 0, -1)),
                                      np.asarray(a))

    def test_pm_rods_soa_matches_aos(self):
        from lambda_cdm_tpu.ops.pallas_pm_rods import (assemble_rods,
                                                       pallas_deposit_rods,
                                                       pallas_gather_fd4)
        bpos, soa, bmass, box, ncell, cap = self._buckets()
        ng = 16
        counts = (bmass > 0).sum(1).astype(jnp.int32)
        for cnts in (counts, None):
            bl_a, dr_a = pallas_deposit_rods(
                bpos, bmass, ncell=ncell, ng=ng, box_size=box,
                counts=cnts, interpret=True)
            bl_s, dr_s = pallas_deposit_rods(
                soa, bmass, ncell=ncell, ng=ng, box_size=box,
                counts=cnts, interpret=True)
            np.testing.assert_array_equal(np.asarray(bl_a),
                                          np.asarray(bl_s))
            assert int(dr_a) == int(dr_s)
            phi = jax.random.normal(jax.random.PRNGKey(1), (ng, ng, ng))
            g_a = pallas_gather_fd4(phi, bpos, ncell=ncell, ng=ng,
                                    box_size=box, counts=cnts,
                                    interpret=True)
            g_s = pallas_gather_fd4(phi, soa, ncell=ncell, ng=ng,
                                    box_size=box, counts=cnts,
                                    interpret=True)
            np.testing.assert_array_equal(
                np.asarray(jnp.moveaxis(g_s, 0, -1)), np.asarray(g_a))

    def test_fast_state_roundtrip(self):
        """build -> flatten round-trips every live particle (SoA)."""
        from lambda_cdm_tpu.ops.fast_treepm import (build_fast_state,
                                                    flatten_fast_state)
        n, box = 2000, 25.0
        pos = jax.random.uniform(jax.random.PRNGKey(2), (n, 3),
                                 maxval=box)
        vel = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
        mass = jnp.ones((n,))
        plan = {"ncell": 4, "capacity": 128, "margin": 1}
        fs = build_fast_state(pos, vel, mass, 0.5, box_size=box,
                              plan=plan)
        assert fs.bpos.shape == (3, 64, 128)
        p2, v2, m2, ids = flatten_fast_state(fs, with_ids=True)
        live = np.asarray(m2) > 0
        assert live.sum() == n
        order = np.argsort(np.asarray(ids)[live])
        np.testing.assert_allclose(np.asarray(p2)[live][order],
                                   np.asarray(pos), rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(v2)[live][order],
                                   np.asarray(vel), rtol=0, atol=0)


class TestCompactScatterRebucket:
    """The compact-then-scatter rebucket (n_rows set, sparse S/N) must
    be BITWISE identical to the gather rebucket: the gather form
    sorts/row-gathers all C*K slots (20 s at the pre-sized 1M/cap-4096
    science geometry, 98% dead slots); the compact form's sort,
    gathers and scatters run over the live particles only."""

    def test_bitwise_equal_paths(self):
        from lambda_cdm_tpu.ops.fast_treepm import (_rebucket,
                                                    build_fast_state)
        n, box, ncell, cap = 3000, 25.0, 4, 512
        pos = jax.random.uniform(jax.random.PRNGKey(0), (n, 3),
                                 maxval=box)
        vel = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        mass = jnp.ones((n,)).at[: n // 10].set(0.0)    # dead rows too
        plan = {"ncell": ncell, "capacity": cap, "margin": 1}
        fs = build_fast_state(pos, vel, mass, 0.5, box_size=box,
                              plan=plan)
        live3 = (fs.bmass > 0)[None]
        fs = fs.replace(
            acc=jax.random.normal(jax.random.PRNGKey(2), fs.bpos.shape),
            bpos=fs.bpos + 0.8 * jax.random.normal(
                jax.random.PRNGKey(3), fs.bpos.shape) * live3)
        a = _rebucket(fs, box_size=box, ncell=ncell, capacity=cap)
        b = _rebucket(fs, box_size=box, ncell=ncell, capacity=cap,
                      n_rows=n)
        for f in ("bpos", "bvel", "bmass", "ids", "acc"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
                err_msg=f)
        assert int(a.overflow) == int(b.overflow)
