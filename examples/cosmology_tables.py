"""Background-cosmology tables: H(z), ages, distances, growth, P(k).

Mirror of the reference's `cosmology_test` (examples/cosmology_test.cpp:
8-116), with values that are asserted in tests/test_cosmology.py rather
than eyeballed.
"""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp

from lambda_cdm_tpu.physics import cosmology as cos
from lambda_cdm_tpu.physics.power_spectra import linear_power
from lambda_cdm_tpu.physics.cosmology import CosmologyParams


def main():
    p = CosmologyParams()
    print(f"Omega_m={p.omega_m} Omega_L={p.omega_lambda} h={p.h} "
          f"sigma8={p.sigma8} ns={p.n_s}")
    print(f"age of universe: {float(cos.age_of_universe(p)):.3f} Gyr\n")

    print(f"{'z':>6} {'H(z)':>9} {'D_C[Mpc]':>10} {'D_A':>9} {'D_L':>10} "
          f"{'D(z)':>7} {'f(z)':>7}")
    for z in (0.0, 0.5, 1.0, 2.0, 5.0, 10.0, 49.0):
        a = 1.0 / (1.0 + z)
        print(f"{z:6.1f} {float(cos.hubble_z(p, z)):9.2f} "
              f"{float(cos.comoving_distance(p, z)):10.1f} "
              f"{float(cos.angular_diameter_distance(p, z)):9.1f} "
              f"{float(cos.luminosity_distance(p, z)):10.1f} "
              f"{float(cos.growth_factor(p, a)):7.4f} "
              f"{float(cos.growth_rate(p, a)):7.4f}")

    print(f"\n{'k [h/Mpc]':>10} {'P(k,z=0)':>12}")
    for k in (0.01, 0.05, 0.1, 0.5, 1.0):
        print(f"{k:10.3f} {float(linear_power(p, k)):12.2f}")


if __name__ == "__main__":
    main()
