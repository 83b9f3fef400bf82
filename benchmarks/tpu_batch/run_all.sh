#!/bin/bash
# Consolidated TPU measurement batch (round 3), priority-ordered so a
# short tunnel window captures the VERDICT-gating numbers first.
# Launch from a /tmp snapshot (never edit a script a runner executes):
#   cp benchmarks/tpu_batch/run_all.sh /tmp/run_all_r3.sh
#   nohup bash /tmp/run_all_r3.sh > /tmp/seq_tpu_r3.log 2>&1 &
cd /root/repo
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:/root/.axon_site

until timeout 240 python -c "import jax; print(jax.devices())" > /tmp/r3_gate.log 2>&1; do
  echo "tunnel still down $(date)"
  sleep 120
done
echo "=== TUNNEL UP $(date)"

run() { name=$1; to=$2; shift 2; echo "=== $name start $(date)"; timeout $to "$@" > /tmp/r3_$name.log 2>&1; echo "=== $name exit $? $(date)"; }

run drive      900 python benchmarks/tpu_batch/drive_parity.py
run grid_mid  3600 env BENCH_PS=1000,10000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py
run bench     3600 python bench.py
run sym_check 3600 python benchmarks/tpu_batch/sym_check.py
run vpu_proof 2400 python benchmarks/vpu_bound_proof.py
run grid_full 3600 env BENCH_PS=3,5,10,100,100000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py
run diag_mid  2400 python benchmarks/tpu_batch/diag_mid.py
# Mesh kernel-path numerical contract on hardware (VERDICT r2 weak #5).
run mesh_parity 1800 python benchmarks/tpu_batch/mesh_parity.py
run mesh1     2400 python benchmarks/mesh_one_chip.py
# AOT artifact load -> first-call compile -> parity on chip (r2 task 9).
run aot_chip  2400 python benchmarks/tpu_batch/aot_chip.py
run widek     2400 python benchmarks/widek_genomics.py
# SYRK A/B for the wide-K batched downdate (separate process: import-once
# knob). Compare the folds phase against the plain widek step above.
run widek_syrk 2400 env CVMATRIX_TPU_BATCH_SYRK=1 python benchmarks/widek_genomics.py
run bench_f32 2400 env BENCH_DTYPE=float32 python bench.py
# Two-folds-per-step A/Bs (separate processes, import-once knobs): pay
# only if the fold loop is partly step-overhead-bound; compare the folds
# phase + folds/s against the bench/grid LOOCV rows.
run bench_f32x2 2400 env BENCH_DTYPE=float32 CVMATRIX_TPU_F32X2=1 python bench.py
run bench_df64x2 2400 env CVMATRIX_TPU_DF64X2=1 python bench.py
run probe_transpose 1200 python benchmarks/tpu_batch/probe_transpose.py
# Ozaki trim-budget A/B (separate process: the knob is import-once).
# Budget -31 is the loosest setting that still holds the 1e-8 contract at
# bench scale (~2e-9 absolute trim error) and it drops one product group
# at BOTH mid-band brackets: Lp=128 (P=1000) needs >= -31, Lp=32
# (P=10000) drops from -33. P=100000 is omitted — the fused LOOCV
# kernels never call ozaki_trim_groups, so its rows would be a null
# measurement. Compare fold phase against the default-budget grid_mid.
run ozaki_budget 3600 env CVMATRIX_TPU_OZAKI_BUDGET_LOG2=-31 BENCH_PS=1000,10000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_budget31.csv python benchmarks/benchmark.py
run modes     5400 env BENCH_PERSISTENT_CACHE=0 BENCH_MODES=nojit,coldjit,warmjit BENCH_PS=100,10000,100000 BENCH_CONFIGS=TTTT BENCH_CSV=benchmarks/grid_tpu.csv python benchmarks/benchmark.py
echo "=== ALL DONE $(date)"
