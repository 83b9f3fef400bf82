#!/bin/bash
# Round-5 phase-A TPU batch: the measurements VERDICT r4 flagged as
# missing, none of which depend on round-5 code changes.
#
# NEW (VERDICT r4 weak #3): every step's log + exit code is copied into
# benchmarks/tpu_batch/logs/ (committed), so a missing artifact is
# visible in-repo instead of dying with /tmp.
#
#   cp benchmarks/tpu_batch/run_r5_phase_a.sh /tmp/run_r5a.sh
#   nohup bash /tmp/run_r5a.sh > /tmp/seq_tpu_r5a.log 2>&1 &
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
    timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
    rc=$?
    echo "rc=$rc attempt=$attempt timeout=$to date=$(date -u +%FT%TZ)" \
      > "$LOGDIR/$name.rc"
    echo "=== $name exit $rc $(date)"
    [ $rc -eq 0 ] && break
  done
}

# Mesh-of-one after the round-4 zero-collective LOOCV fast path
# (commit 6d28f59) — the recorded 3.58x at P=100k predates it.
run mesh1 6000 env BENCH_PS=1000,10000,100000 python benchmarks/mesh_one_chip.py

# Bench-scale mesh kernel parity (the 1e-12-relative claim currently
# lives only in commit message 1c4b797).
run mesh_parity 4800 env BENCH_N=100000 BENCH_K=500 BENCH_M=10 BENCH_PS=1000 BENCH_SAMPLE=48 python benchmarks/tpu_batch/mesh_parity.py

# Cold-start decomposition vs an empty scratch cache: reconcile the
# 182 s (BENCH_r04) vs 28 s (ROADMAP r3) fit-compile discrepancy.
run coldstart 4800 python benchmarks/tpu_batch/coldstart_phases.py

# VPU issue-rate proof for the df64 LOOCV epilogue (queued and lost in
# rounds 3 and 4; runs LAST because custom kernel timing loops have
# crashed the remote compile helper before).
run vpu 4800 python benchmarks/vpu_bound_proof.py

echo "=== ALL DONE $(date)"
