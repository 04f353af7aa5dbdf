#!/bin/bash
# Round-4 TPU queue, part 3 (fresh VM): the measurements part 2 queued but the
# machine reset before they ran.
#
#   b16_pregate   official config with the NS pre-gate (eb82bcd) -- first
#                 post-pre-gate throughput/MFU number; also warms the fresh
#                 persistent XLA cache and captures the real-data train bench
#                 (examples/bench_dataset is committed, so no rehydrate needed).
#   ab2_*         blocked-LU A/B (solvers/linalg.blocked_lu_factor): NUIG
#                 panel 128/256, LLNL panel 128 (heaviest LU user).
#
# Usage: nohup bash scripts/round4_coordinator3.sh > /tmp/round4_coord3.log 2>&1 &
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 60; done
trap 'rmdir "$LOCK"' EXIT
mkdir -p runs/bench_r4

run_arm() {  # run_arm <outfile> [env...]
  local out=$1; shift
  for i in 1 2 3; do
    echo "=== [$out] attempt $i ($(date +%T))"
    env "$@" python bench.py > "runs/bench_r4/$out" \
      && grep -q '"value"' "runs/bench_r4/$out" \
      && { echo "=== [$out] OK ($(date +%T))"; return 0; }
    sleep 20
  done
  echo "=== [$out] FAILED after 3 attempts -- continuing"
}

run_arm b16_pregate.json
run_arm ab2_p128.json HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS='{"lu_panel": 128}'
run_arm ab2_p256.json HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS='{"lu_panel": 256}'
run_arm ab2_llnl_p128.json HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_MECH=LLNL HEXPYRO_BENCH_OPTS='{"lu_panel": 128}'
run_arm ab2_llnl_base.json HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_MECH=LLNL

echo "=== round-4 queue part 3 complete ($(date +%T))"
