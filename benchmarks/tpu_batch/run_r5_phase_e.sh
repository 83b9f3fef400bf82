#!/bin/bash
# Round-5 phase-E TPU batch: runs AFTER phase D. The mesh(1) re-measure
# lands last in the round on purpose — the hoisted-prep reduce sweeps
# (commits 36d936a, ea8b62e) change exactly the mid-band and LOOCV legs
# it measures, so this records their on-chip effect:
#   1. mesh1 3-leg at P in {1e3, 1e4, 1e5}: materialize / single-chip
#      reduce / mesh(1) reduce. mesh1_over_single_reduce is the mesh
#      overhead; the old vs-materialize ratio conflated it with reduce
#      semantics (see mesh_one_chip.py docstring).
#   2. bench_cold_aot re-measure: the 42.8 s first call recorded in
#      phase D contradicts the 9.7 s r4 artifact and the 11.3 s cold
#      decomposition — suspected helper backlog right after a killed
#      concurrent job; re-record in a clean window.
#
#   cp benchmarks/tpu_batch/run_r5_phase_e.sh /tmp/run_r5e.sh
#   nohup bash /tmp/run_r5e.sh > /tmp/seq_tpu_r5e.log 2>&1 &
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:/root/.axon_site
LOGDIR=/root/repo/benchmarks/tpu_batch/logs
mkdir -p "$LOGDIR"

gate() {
  until timeout 300 python -c "
import time, jax, jax.numpy as jnp
n = int(time.time()) % 89 + 11
x = jnp.arange(float(n)) * 3.0
print('gate ok: n=', n, 'val=', float(x[n - 1]))
" > /tmp/r5_gate.log 2>&1; do
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
    timeout "$to" "$@" > "$LOGDIR/$name.a$attempt.log" 2>&1
    rc=$?
    cp "$LOGDIR/$name.a$attempt.log" "$LOGDIR/$name.log"
    echo "rc=$rc attempt=$attempt timeout=$to date=$(date -u +%FT%TZ)" \
      > "$LOGDIR/$name.rc"
    echo "=== $name exit $rc $(date)"
    [ $rc -eq 0 ] && break
  done
}

# Mesh-of-one, 3-legged, after the hoisted-prep reduce sweeps.
run mesh1 9000 env BENCH_PS=1000,10000,100000 python benchmarks/mesh_one_chip.py

# Clean-window cold-AOT re-measure (fresh process, artifact present).
run bench_cold_aot2 1800 env BENCH_PHASES=0 python bench.py

# Compiler memory accounting for the wide-K programs (runtime
# memory_stats() is unavailable on axon; compiles hit the persistent
# cache from the phase-D widek run).
run widek_memstats 3600 python benchmarks/widek_memstats.py

echo "=== ALL DONE $(date)"
