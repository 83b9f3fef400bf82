#!/bin/bash
# Round-5 phase-B TPU batch: measurements that depend on the round-5 code
# changes (restructured wide-K SYRK assembly + unweighted shared slices;
# single-chip LOOCV reduce fast path; 3-leg mesh_one_chip). Runs AFTER the
# library changes are committed and the fast suite is green.
#
#   cp benchmarks/tpu_batch/run_r5_phase_b.sh /tmp/run_r5b.sh
#   nohup bash /tmp/run_r5b.sh > /tmp/seq_tpu_r5b.log 2>&1 &
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
    # Per-attempt logs: a retry must not clobber the failed attempt's
    # error (phase-A lesson: vpu attempt 1's crash log was lost).
    timeout "$to" "$@" > "$LOGDIR/$name.a$attempt.log" 2>&1
    rc=$?
    cp "$LOGDIR/$name.a$attempt.log" "$LOGDIR/$name.log"
    echo "rc=$rc attempt=$attempt timeout=$to date=$(date -u +%FT%TZ)" \
      > "$LOGDIR/$name.rc"
    echo "=== $name exit $rc $(date)"
    [ $rc -eq 0 ] && break
  done
}

# Wide-K genomics (BASELINE config 4, zero evidence after three rounds).
# Default routing first — its uncached fit compile is the 967 s defect the
# round-5 restructure targets; the log records the compile+run split.
run widek_default 7200 python benchmarks/widek_genomics.py
run widek_syrk    7200 env CVMATRIX_TPU_BATCH_SYRK=1 python benchmarks/widek_genomics.py

# Mesh-of-one, now 3-legged (materialize / single-chip reduce / mesh(1)
# reduce): mesh1_over_single_reduce is the true mesh overhead. The
# single-chip reduce leg also exercises the new hoisted LOOCV fast path.
run mesh1 7200 env BENCH_PS=1000,10000,100000 python benchmarks/mesh_one_chip.py

# Headline at the new version (also re-exports the version-keyed AOT
# artifact for the cold path after measuring).
run bench 4800 python bench.py
# Cold-AOT row: fresh process, artifact present, no phase programs.
run bench_cold_aot 1800 env BENCH_PHASES=0 python bench.py

# Ozaki trim-budget A/B at the headline (VERDICT r4 item 7): -29 trims
# one more slice group than the recorded -31 default; tail stays ~2e-9 of
# the column-scale product, inside the 1e-8 contract. AOT off: routing is
# baked into the artifact at export.
run bench_budget29 4800 env BENCH_AOT=0 BENCH_PHASES=0 CVMATRIX_TPU_OZAKI_BUDGET_LOG2=-29 python bench.py

echo "=== ALL DONE $(date)"
