#!/bin/bash
# Round-4 phase-B TPU batch: routing A/Bs + fixed-mesh re-measurement.
# The final headline/grid/cold rows run in phase C AFTER the default-flip
# decision (run_r4_phase_c.sh). Same per-step compile gate as phase A.
#
#   cp benchmarks/tpu_batch/run_r4_phase_b.sh /tmp/run_r4b.sh
#   nohup bash /tmp/run_r4b.sh > /tmp/seq_tpu_r4b.log 2>&1 &
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
run bench_sym_on  4800 env BENCH_AOT=0 BENCH_PHASES=0 CVMATRIX_TPU_SYM_LOOCV=1 python bench.py
run bench_sym_off 4800 env BENCH_AOT=0 BENCH_PHASES=0 CVMATRIX_TPU_SYM_LOOCV=0 python bench.py
# Mesh-of-one after the v3/LOOCV from-blocks fold-path fix, incl. LOOCV.
run mesh1      4800 env BENCH_PS=1000,10000,100000 python benchmarks/mesh_one_chip.py
# K=20k default-routing row (the SYRK variant ran in phase A; the default
# run timed out on a 967 s uncached fit compile — both compiles are now
# in the persistent cache).
run widek      3600 python benchmarks/widek_genomics.py
# Bench-scale mesh kernel parity (magnitude-scaled gate; the flat 1e-8
# absolute gate mis-fired at O(25k)-magnitude entries — 2.5e-8 abs =
# 1e-12 relative, the same drift two pure-f64 recomputations show).
run mesh_parity 3600 env BENCH_N=100000 BENCH_K=500 BENCH_M=10 BENCH_PS=1000 BENCH_SAMPLE=48 python benchmarks/tpu_batch/mesh_parity.py
# v3-sym A/B at mid-band (same knob routes the v3 sym kernel).
run grid_sym   3600 env CVMATRIX_TPU_SYM_LOOCV=1 BENCH_PS=1000,10000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_sym.csv python benchmarks/benchmark.py
echo "=== ALL DONE $(date)"
