"""1LPT vs 2LPT initial-conditions comparison.

Mirror of the reference's `2lpt_test` (examples/2lpt_test.cpp:8-181):
RMS displacement/velocity ratios and cross-correlation between 1LPT and
2LPT fields generated from the same seed.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.forces.direct import min_image
from lambda_cdm_tpu.physics import initial_conditions as ics
from lambda_cdm_tpu.physics.cosmology import CosmologyParams


def main():
    ng, box, z_init = 64, 200.0, 24.0
    params = CosmologyParams()
    a = 1.0 / (1.0 + z_init)
    key = jax.random.PRNGKey(7)

    p1, v1 = ics.lpt_displacements(key, params, ng=ng, n_side=ng,
                                   box_size=box, a_init=a, use_2lpt=False)
    p2, v2 = ics.lpt_displacements(key, params, ng=ng, n_side=ng,
                                   box_size=box, a_init=a, use_2lpt=True)

    q = ics.lattice_positions(ng, box)
    d1 = min_image(p1 - q, box)
    d2 = min_image(p2 - q, box)
    rms1 = float(jnp.sqrt(jnp.mean(jnp.sum(d1 ** 2, -1))))
    rms2 = float(jnp.sqrt(jnp.mean(jnp.sum(d2 ** 2, -1))))
    vrms1 = float(jnp.sqrt(jnp.mean(jnp.sum(v1 ** 2, -1))))
    vrms2 = float(jnp.sqrt(jnp.mean(jnp.sum(v2 ** 2, -1))))

    corr = np.corrcoef(np.asarray(d1).ravel(), np.asarray(d2).ravel())[0, 1]
    diff = min_image(p2 - p1, box)
    rms_2nd = float(jnp.sqrt(jnp.mean(jnp.sum(diff ** 2, -1))))

    print(f"z={z_init}  {ng}^3 particles  box {box} Mpc/h")
    print(f"rms displacement: 1LPT {rms1:.4f}  2LPT {rms2:.4f}  "
          f"ratio {rms2 / rms1:.4f}")
    print(f"rms velocity:     1LPT {vrms1:.2f}  2LPT {vrms2:.2f}  "
          f"ratio {vrms2 / vrms1:.4f}")
    print(f"2nd-order displacement rms: {rms_2nd:.4f} "
          f"({rms_2nd / rms1 * 100:.2f}% of 1LPT)")
    print(f"1LPT x 2LPT cross-correlation: {corr:.6f}")


if __name__ == "__main__":
    main()
