#!/bin/bash
# Round-4 phase-C TPU batch: final headline/grid/cold rows on the
# decided routing defaults. Same per-step compile gate as phase A.
#
#   cp benchmarks/tpu_batch/run_r4_phase_c.sh /tmp/run_r4c.sh
#   nohup bash /tmp/run_r4c.sh > /tmp/seq_tpu_r4c.log 2>&1 &
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:/root/.axon_site

gate() {
  until timeout 300 python -c "
import time, jax, jax.numpy as jnp
n = int(time.time()) % 89 + 11
x = jnp.arange(float(n)) * 3.0
print('gate ok: n=', n, 'val=', float(x[n - 1]))
" > /tmp/r4_gate.log 2>&1; do
    echo "tunnel/compile helper not responding $(date)"
    sleep 180
  done
  echo "=== GATE OK $(date)"
}

run() {
  name=$1; to=$2; shift 2
  for attempt in 1 2; do
    gate
    echo "=== $name start (attempt $attempt) $(date)"
    timeout "$to" "$@" > /tmp/r4_$name.log 2>&1
    rc=$?
    echo "=== $name exit $rc $(date)"
    [ $rc -eq 0 ] && break
  done
}

# Sym-kernel A/B at the headline level (VERDICT r3 item 1): two separate
# processes, AOT disabled so the artifact cannot bypass the routing knob
# (routing is baked at export). The standalone kernel timing loop
# (sym_check.py) crashed the remote compile helper twice on 2026-08-19;
# bench.py's program is the same sweep and compiles reliably.
# Final headline + grid rows on the decided defaults, AOT cold start.
run bench      4800 python bench.py
# AOT cold start: fresh process, persistent cache OFF, no phase programs —
# the total-CV first call pays only the artifact's device compile
# (VERDICT r3 weak #5 "make cold start honest and fast").
run bench_cold 4800 env BENCH_PERSISTENT_CACHE=0 BENCH_PHASES=0 python bench.py
# Grid rows for the round-4 version (mid-band + full sweep).
run grid_mid   3600 env BENCH_PS=1000,10000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py
run grid_full  4800 env BENCH_PS=3,5,10,100,100000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py
# f32 engine headline (store-bound band; pairs with the vpu-proof copy row).
run bench_f32  2400 env BENCH_DTYPE=float32 python bench.py
echo "=== ALL DONE $(date)"
