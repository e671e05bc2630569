#!/bin/bash
# Round-5 follow-on captures (run after tpu_queue5.sh):
#   stage 1  full bench.py re-run — everything warm from queue5 plus
#            the FIXED cpu-ref platform binding, so the accuracy
#            section completes and the final RESULT line is whole
#   stage 2  clustered-state split re-optimization on the flagship
#            record (VERDICT r4 item 4 attack)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue5
mkdir -p $LOG

echo "=== stage 0: trivial jit probe"
timeout 600 python -c "
import jax, jax.numpy as jnp, numpy as np
print('alive', np.asarray(jax.jit(lambda a: a*2)(jnp.ones((8,128))))[0,0])
" > $LOG/probe_b.log 2>&1 || { echo "stage 0 FAILED (tunnel down)"; exit 1; }
echo ok

echo "=== stage 1: full bench.py (warm, fixed accuracy section)"
BENCH_WATCHDOG_S=9000 timeout 9600 python bench.py > $LOG/bench_b.log 2>&1
rc=$?
grep -v cpu_aot_loader $LOG/bench_b.log | grep "accuracy/" | tail -6
echo "bench rc=$rc"

echo "=== stage 2: z=0 split ladder on the flagship record"
if [ -f science_record.npz ]; then
  timeout 7200 python benchmarks/exp_z0_split.py > $LOG/z0split.log 2>&1
  rc=$?
  grep -v cpu_aot_loader $LOG/z0split.log | tail -8
  echo "z0split rc=$rc"
else
  echo "no science_record.npz — flagship run has not landed"
fi
