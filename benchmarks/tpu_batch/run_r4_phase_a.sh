#!/bin/bash
# Round-4 phase-A TPU measurement batch: the VERDICT r3 "do this" items
# that measure EXISTING code (sym A/B, VPU proof, mesh(1) phase split at
# bench scale, bench-scale mesh parity, wide-K genomics + SYRK A/B).
# Launch from a /tmp snapshot:
#   cp benchmarks/tpu_batch/run_r4_phase_a.sh /tmp/run_r4a.sh
#   nohup bash /tmp/run_r4a.sh > /tmp/seq_tpu_r4a.log 2>&1 &
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:/root/.axon_site

until timeout 240 python -c "import jax; print(jax.devices())" > /tmp/r4_gate.log 2>&1; do
  echo "tunnel still down $(date)"
  sleep 120
done
echo "=== TUNNEL UP $(date)"

run() { name=$1; to=$2; shift 2; echo "=== $name start $(date)"; timeout $to "$@" > /tmp/r4_$name.log 2>&1; echo "=== $name exit $? $(date)"; }

run sym_check  3600 python benchmarks/tpu_batch/sym_check.py
run vpu_proof  2400 python benchmarks/vpu_bound_proof.py
run diag_mesh1 3600 python benchmarks/tpu_batch/diag_mesh1.py
run mesh_parity 3600 env BENCH_N=100000 BENCH_K=500 BENCH_M=10 BENCH_PS=1000 BENCH_SAMPLE=48 python benchmarks/tpu_batch/mesh_parity.py
run widek      2400 python benchmarks/widek_genomics.py
run widek_syrk 2400 env CVMATRIX_TPU_BATCH_SYRK=1 python benchmarks/widek_genomics.py
echo "=== ALL DONE $(date)"
