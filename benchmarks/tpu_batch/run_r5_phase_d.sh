#!/bin/bash
# Round-5 phase-D TPU batch: phase-B2 remains + phase-C grid refresh in
# one serialized chain (never two TPU jobs at once). Ordering:
#   1. bench / bench_cold_aot / bench_budget29 — the 0.5.0 headline,
#      the cold-AOT row (bench re-exports the version-keyed artifact),
#      and the Ozaki trim-budget A/B (VERDICT r4 item 7).
#   2. widek — re-measure BASELINE config #4 after the recombination
#      fusion reorder (commit eb2247a touches the blocked route).
#   3. grid_* — every figure input re-measured at the current version
#      (VERDICT r4 item 4) incl. the aotcold mode and the f32 rows.
#   4. budget29 parity spot check, then the crash-prone VPU proof LAST
#      so a helper crash cannot cost grid rows.
# mesh1 is deliberately absent: the P=100k overhead (3.82x in
# benchmarks/mesh_one_chip.json) is being diagnosed on the CPU mesh
# first; re-measuring before a fix would record the same number.
#
#   cp benchmarks/tpu_batch/run_r5_phase_d.sh /tmp/run_r5d.sh
#   nohup bash /tmp/run_r5d.sh > /tmp/seq_tpu_r5d.log 2>&1 &
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

# Headline at 0.5.0 (re-exports the version-keyed AOT artifact after).
run bench 4800 python bench.py
# Cold-AOT row: fresh process, artifact present, no phase programs.
run bench_cold_aot 1800 env BENCH_PHASES=0 python bench.py
# Ozaki trim-budget A/B at the headline (AOT off: routing baked at export).
run bench_budget29 4800 env BENCH_AOT=0 BENCH_PHASES=0 CVMATRIX_TPU_OZAKI_BUDGET_LOG2=-29 python bench.py

# Wide-K re-measure after the recombination fusion reorder (default
# blocked route only — the SYRK route OOMs, verdict already recorded).
run widek 7200 python benchmarks/widek_genomics.py

# Main grid: the 3 reference-figure combos x weighted x 7 P brackets.
run grid_main 10800 env BENCH_PS=3,5,10,100,1000,10000,100000 BENCH_CONFIGS=plot BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py

# All-16-combos figure (reference combos grid shape: N=10k, M=1, P=10).
run grid_combos 7200 env BENCH_N=10000 BENCH_M=1 BENCH_PS=10 BENCH_CONFIGS=all BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py

# JIT-modes figure rows (incl. the aotcold row via the bench artifact).
run grid_modes 7200 env BENCH_PS=100,10000,100000 BENCH_CONFIGS=TTTT BENCH_MODES=nojit,coldjit,warmjit,aotcold BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py

# f32 engine rows (separate CSV: the grid key carries no dtype). FFFF
# LOOCV is where HBM stores are the honest ceiling (VERDICT item 3).
run grid_f32 4800 env BENCH_DTYPE=float32 BENCH_PS=100000 BENCH_CONFIGS=TTTT,FFFF BENCH_CSV=benchmarks/grid_f32.csv python benchmarks/benchmark.py

# Trim-budget -29 parity spot check (pairs with bench_budget29).
run budget29_parity 1800 env CVMATRIX_TPU_OZAKI_BUDGET_LOG2=-29 python benchmarks/tpu_batch/drive_parity.py

# VPU issue-rate proof, crash-tolerant (real variants first, the
# helper-crashing copy kernel last, per-variant failure isolation).
run vpu 4800 python benchmarks/vpu_bound_proof.py

echo "=== ALL DONE $(date)"
