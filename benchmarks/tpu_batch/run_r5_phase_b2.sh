#!/bin/bash
# Round-5 phase-B2: the phase-B steps remaining after the widek pair
# (default landed; syrk OOMed — A/B decided, knob capped below the
# blocked threshold). Phase B was stopped before widek_syrk's attempt 2
# to avoid a third deterministic OOM + helper crash.
#
#   cp benchmarks/tpu_batch/run_r5_phase_b2.sh /tmp/run_r5b2.sh
#   nohup bash /tmp/run_r5b2.sh > /tmp/seq_tpu_r5b2.log 2>&1 &
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

# Mesh-of-one, 3-legged (materialize / single-chip reduce / mesh(1)).
run mesh1 7200 env BENCH_PS=1000,10000,100000 python benchmarks/mesh_one_chip.py

# Headline at 0.5.0 (re-exports the version-keyed AOT artifact after).
run bench 4800 python bench.py
# Cold-AOT row: fresh process, artifact present, no phase programs.
run bench_cold_aot 1800 env BENCH_PHASES=0 python bench.py

# Ozaki trim-budget A/B at the headline (AOT off: routing baked at export).
run bench_budget29 4800 env BENCH_AOT=0 BENCH_PHASES=0 CVMATRIX_TPU_OZAKI_BUDGET_LOG2=-29 python bench.py

echo "=== ALL DONE $(date)"
