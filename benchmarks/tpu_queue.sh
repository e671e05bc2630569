#!/bin/bash
# TPU-return validation queue (round-2 session 4). Run when the axon
# tunnel recovers. Each stage is timeout-bounded and logs to its own
# file; later stages only run if the earlier, smaller ones pass, so a
# kernel that wedges the chip is caught by the cheapest probe first.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue
mkdir -p $LOG

echo "=== stage 0: trivial jit probe"
timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
print('alive', np.asarray(jax.jit(lambda a: a*2)(jnp.ones((8,128))))[0,0])
" > $LOG/probe.log 2>&1 || { echo "stage 0 FAILED (tunnel down)"; exit 1; }

echo "=== stage 1: Pallas aliasing probe (tiny, Gauss-Seidel ordering)"
timeout 900 python benchmarks/probe_alias.py > $LOG/alias.log 2>&1
rc=$?
tail -2 $LOG/alias.log
[ $rc -ne 0 ] && echo "stage 1 rc=$rc (aliasing probe failed/hung)" && exit 1

echo "=== stage 2: tiny FoF GS hook on hardware"
timeout 900 python - > $LOG/fof_tiny.log 2>&1 <<'EOF'
import sys; sys.path.insert(0, ".")
import jax.numpy as jnp
from lambda_cdm_tpu.ops.pallas_fof import pallas_fof_hook
ncell, cap = 4, 128
cc = ncell ** 3
n_sent = 10_000
bx = jnp.zeros((cc, cap)); by = jnp.zeros((cc, cap)); bz = jnp.zeros((cc, cap))
# chain of 3 particles across cells 0 and 1 along z (cell size 7.5, b=0.5)
bx = bx.at[0, 0].set(1.0).at[0, 1].set(1.4).at[1, 0].set(7.6)
by = by.at[0, 0].set(1.0).at[0, 1].set(1.0).at[1, 0].set(1.0)
bz = bz.at[0, 0].set(1.0).at[0, 1].set(1.0).at[1, 0].set(1.0)
# bz for cell 1 (z-cell index 1): slot [1,0] holds z=1.0 in cell z=1?? cells
# are rod-major (cx*nc+cy, z): pallas hook's cell id = rod*nc + z; particle
# in z-cell 1 must sit in row 1 of rod 0 -- bx[1,0] etc. is exactly that.
lab = jnp.full((cc, cap), n_sent, jnp.int32)
lab = lab.at[0, 0].set(7).at[0, 1].set(3).at[1, 0].set(5)
counts = jnp.zeros((cc,), jnp.int32).at[0].set(2).at[1].set(1)
out = pallas_fof_hook(bx, by, bz, lab, counts, ncell=ncell, capacity=cap,
                      n_sentinel=n_sent, box_size=30.0, linking_length=0.5,
                      interpret=False)
print("labels:", int(out[0, 0]), int(out[0, 1]), int(out[1, 0]))
assert int(out[0, 0]) == 3 and int(out[0, 1]) == 3, "0<->1 link failed"
# [0,1] at x=1.4 vs [1,0] at x=7.6: distance 6.2 > b -> no link; but
# z-neighbors of the SAME rod see each other: [1,0] is 6.2 from slot 1
# so it keeps min(5, neighbors within b) = 5
assert int(out[1, 0]) == 5, "spurious link"
print("FOF TINY OK")
EOF
rc=$?
tail -3 $LOG/fof_tiny.log
[ $rc -ne 0 ] && echo "stage 2 rc=$rc" && exit 1

echo "=== stage 3: analysis bench (1M FoF GS + windowed catalog + P(k))"
timeout 2400 python benchmarks/profile_catalog.py > $LOG/catalog.log 2>&1
rc=$?; tail -8 $LOG/catalog.log; echo "profile_catalog rc=$rc"
timeout 2400 python benchmarks/bench_analysis.py > $LOG/analysis.log 2>&1
rc=$?; tail -12 $LOG/analysis.log; echo "bench_analysis rc=$rc"

echo "=== stage 4: full bench.py"
timeout 5400 python bench.py > $LOG/bench.log 2>&1
rc=$?
tail -3 $LOG/bench.log
echo "bench rc=$rc"
