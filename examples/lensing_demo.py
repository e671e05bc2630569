"""Lensing raytracer demo: evolve a box, produce convergence/shear maps
and trace a ray bundle through the density field.

This is the capability the reference is *named for* but never implemented
(README.md:32, CLAUDE.md:197-208 list it as planned; zero code exists).
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp

import lambda_cdm_tpu as lc
from lambda_cdm_tpu.raytracing import lensing as lz


def main():
    engine = (lc.SimulationBuilder()
              .with_particles(32 ** 3)
              .with_box_size(200.0)
              .with_time_step(5e-6)
              .with_force_computer("treepm", pm_grid_size=64,
                                   softening_length=0.1)
              .with_cosmology(initial_redshift=24.0)
              .with_initial_conditions("2lpt", grid_size=32, random_seed=5)
              .build())
    engine.run(num_steps=40)
    st = engine.state
    params = engine.config.cosmology_params()
    box = engine.config.particles.box_size

    # Born convergence map
    kappa = lz.convergence_map_from_state(st, params, box, ng=64,
                                          n_planes=8, z_source=1.0)
    print(f"kappa map 64x64: rms={float(jnp.std(kappa)):.3e} "
          f"min={float(jnp.min(kappa)):.3e} max={float(jnp.max(kappa)):.3e}")

    # shear from the same map
    gamma = lz.shear_from_kappa(kappa, box, ng=64)
    print(f"shear rms: {float(jnp.sqrt(jnp.mean(jnp.sum(gamma**2, 0)))):.3e}")

    # multi-plane raytrace of a 16x16 bundle
    planes, d_chi = lz.snapshot_lightcone_planes(
        st.positions, st.masses, box, ng=64, n_planes=8)
    from lambda_cdm_tpu.physics.cosmology import comoving_distance
    chi_s = float(comoving_distance(params, 1.0) * params.h)
    chis = jnp.linspace(0.3 * chi_s, 0.7 * chi_s, 8)
    a_l = jnp.full((8,), st.scale_factor)
    th = jnp.stack(jnp.meshgrid(
        jnp.linspace(0.2, 0.8, 16) * box / chis[0],
        jnp.linspace(0.2, 0.8, 16) * box / chis[0],
        indexing="ij"), -1).reshape(-1, 2)
    bundle = lz.trace_rays(params, planes, chis, a_l, d_chi, box, th,
                           chi_s, ng=64, jacobian=True)
    defl = jnp.sqrt(jnp.sum((bundle.theta - th) ** 2, -1))
    print(f"traced {th.shape[0]} rays through 8 planes: "
          f"mean |deflection| = {float(jnp.mean(defl)):.3e} rad, "
          f"ray kappa rms = {float(jnp.std(bundle.kappa)):.3e}")
    # distortion Jacobians propagated through the planes (post-Born):
    # ray-traced shear/magnification, and the image rotation omega that
    # vanishes identically in any Born treatment
    print(f"ray-traced shear rms = "
          f"{float(jnp.sqrt(jnp.mean(jnp.sum(bundle.gamma**2, -1)))):.3e}, "
          f"mu rms-1 = {float(jnp.std(bundle.mu)):.3e}, "
          f"omega rms = {float(jnp.std(bundle.omega)):.3e}")

    # map-space spectra: measured flat-sky C_ell of the convergence map,
    # E/B decomposition of its shear, and the Limber theory curve
    from lambda_cdm_tpu.analysis.power_spectrum import (
        angular_power_spectrum, shear_eb_spectra)
    fov = box / chi_s                       # angular extent of the map
    ell, cl, counts = angular_power_spectrum(kappa, fov, num_bins=8)
    ell_e, cee, cbb, _, _ = shear_eb_spectra(gamma[0], gamma[1], fov,
                                             num_bins=8)
    cl_th = lz.limber_convergence_cl(params, ell, 1.0)
    print("ell        C_ell(kappa)  C_EE          C_BB          "
          "Limber(linear)")
    for i in range(len(ell)):
        if float(counts[i]) > 0:
            print(f"{float(ell[i]):9.1f}  {float(cl[i]):.4e}  "
                  f"{float(cee[i]):.4e}  {float(cbb[i]):.4e}  "
                  f"{float(cl_th[i]):.4e}")
    print("(C_EE == C_ell(kappa) and C_BB ~ 0: shear here derives from "
          "that same kappa map.\n The Limber column assumes a fully "
          "evolved z~0 lightcone -- this demo's 40-step\n 32^3 box is "
          "deliberately tiny; tests/test_lensing_limber.py validates "
          "the\n absolute normalization against theory.)")


if __name__ == "__main__":
    main()
