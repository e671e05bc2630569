"""Approximate-solver accuracy harness: TreePM / PM vs direct summation.

Mirror of the reference's `barnes_hut_test` accuracy harness
(examples/barnes_hut_test.cu:148-202): direct summation is the oracle;
report avg/max relative force error and speedup. (The TreePM solver plays
the Barnes-Hut role on TPU -- SURVEY.md section 7.)

Usage: python examples/solver_accuracy.py [N]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from lambda_cdm_tpu.forces.direct import direct_accelerations_chunked
from lambda_cdm_tpu.forces.pm import pm_accelerations
from lambda_cdm_tpu.forces.treepm import treepm_accelerations


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384
    box, soft = 100.0, 0.05
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 3), maxval=box)
    m = jnp.ones((n,))

    t0 = time.perf_counter()
    ref = direct_accelerations_chunked(pos, m, box, soft)
    ref.block_until_ready()
    t_direct = time.perf_counter() - t0
    scale = float(jnp.sqrt(jnp.mean(jnp.sum(ref ** 2, -1))))
    print(f"direct O(N^2): {t_direct * 1e3:.1f} ms (oracle)")

    for name, fn in [
        ("treepm(ng=64)", lambda: treepm_accelerations(
            pos, m, box, pm_grid=64, softening=soft)),
        ("pm(ng=128)", lambda: pm_accelerations(pos, m, 128, box)),
    ]:
        out = fn()
        out.block_until_ready()   # compile
        t0 = time.perf_counter()
        out = fn()
        out.block_until_ready()
        dt = time.perf_counter() - t0
        err = np.asarray(jnp.sqrt(jnp.sum((out - ref) ** 2, -1))) / scale
        print(f"{name}: {dt * 1e3:.1f} ms  speedup {t_direct / dt:.1f}x  "
              f"rel err avg {err.mean():.4f} max {err.max():.4f}")
    print("note: ~2% systematic = min-image oracle vs true periodic "
          "forces (tests/test_solvers.py docstring)")


if __name__ == "__main__":
    main()
