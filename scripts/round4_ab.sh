#!/bin/bash
# Rescue-policy A/B at the official bench config (NUIG B=16, carry_jacobian).
#
# Motivation (BENCH r4 b16.json): every one of the 77 Jacobian refreshes fell
# through to the column-sequential LU rescue (~dominant wall-time kernel at
# n=924). Two suppression strategies, separately and combined:
#   ns6   deeper Newton-Schulz refresh (6 iters of pure MXU matmuls) so the
#         carried inverse passes the ||I - A X||_inf quality gate more often;
#   k4    allow the soft-quality rescue only on every 4th refresh (hard
#         failures resid >= 1 always rescue) -- trades preconditioner quality
#         for fewer LUs;
#   ns6k4 both.
# Waits for the shared TPU-queue lock, then runs each arm once.
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 60; done
trap 'rmdir "$LOCK"' EXIT
mkdir -p runs/bench_r4

run_arm() {  # run_arm <name> <opts-json>
  echo "=== [ab:$1] $(date +%T) opts=$2"
  env HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS="$2" \
    python bench.py > "runs/bench_r4/ab_$1.json" \
    && grep -q '"value"' "runs/bench_r4/ab_$1.json" \
    && echo "=== [ab:$1] OK" || echo "=== [ab:$1] FAILED"
}

run_arm ns6   '{"ns_iters": 6}'
run_arm k4    '{"ns_rescue_every": 4}'
run_arm ns6k4 '{"ns_iters": 6, "ns_rescue_every": 4}'

echo "=== A/B complete ($(date +%T))"
