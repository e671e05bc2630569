"""Zel'dovich initial-conditions demo with statistical validation.

Mirror of the reference's `zeldovich_test` (examples/zeldovich_test.cpp:
8-153): generate ICs, validate bounds/finiteness, report displacement and
velocity statistics, and (beyond the reference) verify the measured P(k)
against linear theory.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.analysis.power_spectrum import measure_power_spectrum
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import CosmologyParams, growth_factor
from lambda_cdm_tpu.physics.power_spectra import linear_power


def main():
    ng, box, z_init = 64, 250.0, 49.0
    params = CosmologyParams()
    a = 1.0 / (1.0 + z_init)

    pos, vel = ics.lpt_displacements(
        jax.random.PRNGKey(42), params, ng=ng, n_side=ng, box_size=box,
        a_init=a, use_2lpt=False)
    print(f"generated {ng ** 3} particles at z={z_init} in ({box} Mpc/h)^3")

    stats = ics.displacement_statistics(pos, box, ng)
    print(f"rms displacement: {float(stats['rms_displacement']):.4f} Mpc/h "
          f"(cell = {box / ng:.3f})")
    print(f"max displacement: {float(stats['max_displacement']):.4f}")
    print(f"rms velocity: "
          f"{float(jnp.sqrt(jnp.mean(jnp.sum(vel ** 2, -1)))):.2f} km/s")

    data = measure_power_spectrum(pos, box, ng=ng, num_bins=16,
                                  subtract_shot_noise=False)
    d = float(growth_factor(params, a))
    k = np.asarray(data.k)
    p = np.asarray(data.power)
    c = np.asarray(data.counts)
    print(f"\n{'k':>8} {'P_meas':>10} {'P_lin(z)':>10} {'ratio':>7}")
    for i in range(len(k)):
        if c[i] > 20 and k[i] < 0.3:
            pl = float(linear_power(params, k[i])) * d * d
            print(f"{k[i]:8.4f} {p[i]:10.3f} {pl:10.3f} {p[i] / pl:7.3f}")


if __name__ == "__main__":
    main()
