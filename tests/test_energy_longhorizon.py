"""Long-horizon energy validation (VERDICT round-1 item 10).

The reference CLAIMS <0.1% energy conservation over cosmic time
(/root/reference/CLAUDE.md:256) but ships no test. Two real checks here:

  * Newtonian (frozen scale factor): KE+PE is exactly conserved by the
    symplectic KDK — assert <0.1% drift over a long run on both the
    generic treepm path and the production treepm_fast stepper.
  * Cosmological (comoving kick mode, u = a^2 dx/dt): the Layzer-Irvine
    equation d(T+U)/dt = -H(2T+U) with peculiar KE T = sum m (u/a)^2 / 2
    and physical PE U = U_comoving / a. The cumulative invariant
    C = T + U + integral H (2T+U) dt must stay constant to <0.1% of |U|
    over a: 0.02 -> 1.0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lambda_cdm_tpu.core.config import SimulationConfig
from lambda_cdm_tpu.core.engine import SimulationEngine
from lambda_cdm_tpu.core.state import make_state
from lambda_cdm_tpu.physics.cosmology import CosmologyParams, e_function


pytestmark = pytest.mark.slow  # heavy tier: > ~30 s on one core (smoke cover in test_smoke_fast.py)

def _base_config(solver, n, box):
    cfg = SimulationConfig()
    cfg.particles.num_particles = n
    cfg.particles.box_size = box
    cfg.forces.type = solver
    cfg.forces.pm_grid = 32
    cfg.forces.softening_length = 0.05 * box / round(n ** (1 / 3))
    cfg.time.final_time = 1e9
    cfg.cosmology.initial_redshift = 49.0
    cfg.simulation.output_frequency = 25
    cfg.simulation.checkpoint_frequency = 0
    cfg.profiling.output_file = ""
    return cfg


def _quiet_start(n, box, seed=0, vel_scale=0.05):
    key = jax.random.PRNGKey(seed)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    vel = vel_scale * jax.random.normal(jax.random.PRNGKey(seed + 1),
                                        (n, 3))
    return pos, vel, jnp.ones((n,))


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["treepm", "treepm_fast"])
def test_newtonian_energy_drift_below_0p1pct(solver):
    """KE+PE drift < 0.1% over 600 steps with a frozen scale factor
    (the reference's cuda_nbody_test energy check, done properly)."""
    n, box = 2048, 50.0
    cfg = _base_config(solver, n, box)
    cfg.cosmology.model = "Newtonian"
    cfg.units.system = "box"
    cfg.units.G = 1.0
    cfg.units.H0_internal = 0.1
    cfg.time.initial_timestep = 5e-4
    pos, vel, mass = _quiet_start(n, box)
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=1.0))
    e0 = eng.compute_energy()
    e0_tot = float(e0["total"])
    scale = abs(float(e0["potential"]))
    eng.run(num_steps=600)
    e1 = eng.compute_energy()
    drift = abs(float(e1["total"]) - e0_tot) / scale
    assert drift < 1e-3, f"{solver}: energy drift {drift:.2e}"


@pytest.mark.slow
def test_layzer_irvine_over_cosmic_time():
    """Cosmological energy balance a: 0.02 -> 1.0 (comoving kick mode,
    PM solver): the Layzer-Irvine invariant C = T + U + int H(2T+U) dt
    stays within 1% of |U|.

    U must be the PERIODIC background-subtracted potential energy
    (pm_potential: the same field the forces integrate) -- the min-image
    pairwise sum carries an O(1) offset that breaks the balance. T uses
    peculiar velocities v = u/a (u = a^2 dx/dt is the comoving-kick
    integrator variable)."""
    n, box = 1024, 50.0
    params = CosmologyParams()
    # direct solver: the force is EXACTLY -grad of the pairwise
    # min-image potential the energy measures, so for the comoving-kick
    # Hamiltonian H = sum u^2/2a^2 + U_com/a the balance closes to
    # integrator error. (PM forces are NOT the discrete gradient of the
    # mesh-measured energy: spectral/fd4 leave a systematic ~5% drift
    # during collapse and the interp gradient's piecewise-constant
    # force destroys the symplectic shadow invariant.)
    cfg = _base_config("direct_reference", n, box)
    cfg.integration.kick_mode = "comoving"
    cfg.time.initial_timestep = 1e-5
    # expansion-limited adaptive dt: without it H dt ~ 0.2/step at
    # a = 0.02 and the KDK integration error dominates the balance
    cfg.integration.adaptive_timestep = True
    cfg.integration.max_dloga = 0.01
    cfg.integration.min_timestep = 1e-9
    cfg.integration.max_timestep = 1e-4
    cfg.simulation.output_frequency = 10

    pos, vel, mass = _quiet_start(n, box, vel_scale=0.0)
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=0.02))

    def sample(engine):
        st = engine.state
        a = float(st.scale_factor)
        e = engine.compute_energy()   # pairwise min-image KE/PE
        t_pec = float(e["kinetic"]) / (a * a)
        u_phys = float(e["potential"]) / a
        h = 100.0 * float(e_function(params, a))
        return a, t_pec, u_phys, h, float(st.time)

    a, t_pec, u_phys, h, t_now = sample(eng)
    c0 = t_pec + u_phys
    li = 0.0
    prev = (a, t_pec, u_phys)
    worst = 0.0
    for _ in range(1200):
        eng.run(num_steps=10)
        a, t_pec, u_phys, h, t_now = sample(eng)
        a_p, t_p, u_p = prev
        # int H (2T + U) dt = int (2T + U)/a da. With the comoving
        # scalings T = Tc/a^2 and U = Uc/a (Tc, Uc slowly varying), the
        # 1/a^3 and 1/a^2 integrands are integrable ANALYTICALLY per
        # chunk -- a plain trapezoid cannot resolve 1/a^2 across the
        # large early-time a-leaps (80% error on the first chunk).
        tc = 0.5 * (t_pec * a * a + t_p * a_p * a_p)
        uc = 0.5 * (u_phys * a + u_p * a_p)
        li += (2 * tc * 0.5 * (1 / a_p ** 2 - 1 / a ** 2)
               + uc * (1 / a_p - 1 / a))
        worst = max(worst, abs(t_pec + u_phys + li - c0) / abs(u_phys))
        prev = (a, t_pec, u_phys)
        if a >= 0.999:
            break
    assert a >= 0.999, f"run stalled at a={a}"
    # measured 6.9e-4 over the full arc (recorded in BASELINE.md): the
    # reference's claimed-but-never-tested <0.1% bar, met for real
    assert worst < 1e-3, f"Layzer-Irvine residual {worst:.2e}"
