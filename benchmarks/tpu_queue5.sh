#!/bin/bash
# TPU validation + capture queue (round 5). Stages the round's three
# on-chip deliverables cheapest-probe-first; each runs in a FRESH
# process (fresh-process backend init is 200-330 s on the axon tunnel,
# but a wedged kernel can hang a process unkillably in-process — the
# round-4 lesson is to bundle *related* work per process and bound
# every stage with timeout). Logs under /tmp/tpu_queue5.
#
#   stage 0  trivial jit probe (tunnel alive?)
#   stage 1  bench.py — streams partial JSON per section (VERDICT r4
#            item 2), accuracy section carries the 3-way force
#            attribution vs the Ewald oracle (item 1)
#   stage 2  science_run.py flagship — crash-proof record + cert
#            (items 3/4/8); re-analyzable via --analyze-only
#   stage 3  fresh FoF/catalog timings with the round-4 bidi kernels
#            (item 5)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue5
mkdir -p $LOG

echo "=== stage 0: trivial jit probe"
timeout 600 python -c "
import jax, jax.numpy as jnp, numpy as np
print('alive', np.asarray(jax.jit(lambda a: a*2)(jnp.ones((8,128))))[0,0])
" > $LOG/probe.log 2>&1 || { echo "stage 0 FAILED (tunnel down)"; exit 1; }
echo ok

echo "=== stage 1: full bench.py (streamed sections)"
BENCH_WATCHDOG_S=9000 timeout 9600 python bench.py > $LOG/bench.log 2>&1
rc=$?
grep -o '"acc_force[^,]*' $LOG/bench.log | tail -8
tail -c 600 $LOG/bench.log | tr '\n' ' ' | tail -c 400; echo
echo "bench rc=$rc"

echo "=== stage 2: flagship science run (record + certificate)"
timeout 9600 python science_run.py > $LOG/science.log 2>&1
rc=$?
tail -4 $LOG/science.log
echo "science rc=$rc"

echo "=== stage 3: fresh FoF/analysis timings (round-4 bidi kernels)"
timeout 3600 python benchmarks/bench_analysis.py > $LOG/analysis.log 2>&1
rc=$?
tail -8 $LOG/analysis.log
echo "analysis rc=$rc"
