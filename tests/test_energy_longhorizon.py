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
    n, box, ng = 2048, 50.0, 32
    params = CosmologyParams()
    cfg = _base_config("pm", n, box)
    cfg.integration.kick_mode = "comoving"
    cfg.time.initial_timestep = 1e-5
    cfg.simulation.output_frequency = 10

    pos, vel, mass = _quiet_start(n, box, vel_scale=0.0)
    eng = SimulationEngine(cfg)
    eng.initialize(state=make_state(pos, vel, mass, scale_factor=0.02))

    from lambda_cdm_tpu.forces.pm import pm_potential

    def sample(engine):
        st = engine.state
        a = float(st.scale_factor)
        u2 = jnp.sum(st.masses * jnp.sum(st.velocities ** 2, -1))
        t_pec = 0.5 * float(u2) / (a * a)
        phi = pm_potential(st.positions, st.masses, ng, box,
                           g_const=engine.config.units.G)
        u_phys = 0.5 * float(jnp.sum(st.masses * phi)) / a
        h = 100.0 * float(e_function(params, a))
        return a, t_pec, u_phys, h, float(st.time)

    a, t_pec, u_phys, h, t_now = sample(eng)
    c0 = t_pec + u_phys
    li = 0.0
    prev = (t_pec, u_phys, h, t_now)
    worst = 0.0
    for _ in range(1200):
        eng.run(num_steps=10)
        a, t_pec, u_phys, h, t_now = sample(eng)
        t_p, u_p, h_p, tt_p = prev
        li += 0.5 * (h * (2 * t_pec + u_phys)
                     + h_p * (2 * t_p + u_p)) * (t_now - tt_p)
        worst = max(worst, abs(t_pec + u_phys + li - c0) / abs(u_phys))
        prev = (t_pec, u_phys, h, t_now)
        if a >= 0.999:
            break
    assert a >= 0.999, f"run stalled at a={a}"
    assert worst < 1e-2, f"Layzer-Irvine residual {worst:.2e}"
