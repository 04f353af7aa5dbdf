#!/bin/bash
# Blocked-LU A/B at the official bench config, queued behind the round-4
# coordinator on the shared TPU lock.
#
# Motivation: with the NS pre-gate landed (solvers/linalg.py), the remaining
# refresh cost is jac build + LU rescue, and XLA's TPU LuDecomposition is
# column-sequential over all n columns. blocked_lu_factor runs `panel`-wide
# panels sequentially and each trailing update as one MXU matmul. Arms:
#   p128   8 panels of 128 at NUIG n=924
#   p256   4 panels of 256 (fewer, bigger trailing matmuls)
#   llnl_p128  LLNL B=16 (1.15 refreshes/segment -- the heaviest LU user)
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 60; done
trap 'rmdir "$LOCK"' EXIT
mkdir -p runs/bench_r4

run_arm() {  # run_arm <outfile> [env...]
  local out=$1; shift
  echo "=== [ab2:$out] $(date +%T)"
  env HEXPYRO_BENCH_SKIP_TRAIN=1 "$@" python bench.py > "runs/bench_r4/$out" \
    && grep -q '"value"' "runs/bench_r4/$out" \
    && echo "=== [ab2:$out] OK" || echo "=== [ab2:$out] FAILED"
}

run_arm ab2_p128.json HEXPYRO_BENCH_OPTS='{"lu_panel": 128}'
run_arm ab2_p256.json HEXPYRO_BENCH_OPTS='{"lu_panel": 256}'
run_arm ab2_llnl_p128.json HEXPYRO_BENCH_MECH=LLNL HEXPYRO_BENCH_OPTS='{"lu_panel": 128}'

echo "=== blocked-LU A/B complete ($(date +%T))"
