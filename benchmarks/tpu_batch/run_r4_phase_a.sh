#!/bin/bash
# Round-4 phase-A TPU measurement batch: the VERDICT r3 "do this" items
# that measure EXISTING code (sym A/B, VPU proof, mesh(1) phase split at
# bench scale, bench-scale mesh parity, wide-K genomics + SYRK A/B).
#
# The remote compile helper can wedge for long stretches (a trivial op
# hangs), so every step gates on a REAL compile+execute round trip first
# (fresh shape each attempt -> cannot be served by any compile cache),
# and a failed step gets one retry after re-gating.
#
# Launch from a /tmp snapshot:
#   cp benchmarks/tpu_batch/run_r4_phase_a.sh /tmp/run_r4a.sh
#   nohup bash /tmp/run_r4a.sh > /tmp/seq_tpu_r4a.log 2>&1 &
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:/root/.axon_site

gate() {
  until timeout 300 python -c "
import time, jax, jax.numpy as jnp
n = int(time.time()) % 89 + 11   # fresh shape: forces a real compile
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

run sym_check  3600 python benchmarks/tpu_batch/sym_check.py
run vpu_proof  2400 python benchmarks/vpu_bound_proof.py
run diag_mesh1 3600 python benchmarks/tpu_batch/diag_mesh1.py
run mesh_parity 3600 env BENCH_N=100000 BENCH_K=500 BENCH_M=10 BENCH_PS=1000 BENCH_SAMPLE=48 python benchmarks/tpu_batch/mesh_parity.py
run widek      2400 python benchmarks/widek_genomics.py
run widek_syrk 2400 env CVMATRIX_TPU_BATCH_SYRK=1 python benchmarks/widek_genomics.py
echo "=== ALL DONE $(date)"
