#!/bin/bash
# Round-4 TPU queue: sequential chip jobs with bounded retries.
#
# Lessons folded in from round 3 (ADVICE r3):
#   * every step's outcome is CHECKED; a step that exhausts its retries aborts
#     the whole chain instead of letting later stages run on partial data;
#   * one lock path for every queue-like script on this machine;
#   * no PID-file waiting -- the queue owns the chip for its whole run
#     (bench.py may still preempt a step; stage_simulate resumes by chunk).
#
# Usage: nohup bash scripts/round4_coordinator.sh > /tmp/round4_coord.log 2>&1 &
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
mkdir "$LOCK" 2>/dev/null || { echo "another queue holds $LOCK"; exit 1; }
trap 'rmdir "$LOCK"' EXIT
cd /root/repo
mkdir -p runs/bench_r4

step() {  # step <name> <max_attempts> <cmd...>
  local name=$1 max=$2 i rc; shift 2
  for i in $(seq 1 "$max"); do
    echo "=== [$name] attempt $i/$max ($(date +%T)): $*"
    "$@" && { echo "=== [$name] OK ($(date +%T))"; return 0; }
    rc=$?
    echo "=== [$name] rc=$rc -- retrying in 20s"
    sleep 20
  done
  echo "=== [$name] FAILED after $max attempts -- ABORTING QUEUE"
  exit 1
}

bench_to() {  # bench_to <outfile.json> [env overrides...]
  local out=$1; shift
  env "$@" python bench.py > "runs/bench_r4/$out"
  grep -q '"value"' "runs/bench_r4/$out"
}

# 0. restore committed artifacts into the runs/ layout (no-op when present)
step rehydrate 1 python scripts/rehydrate_runs.py

# 1. official bench at the new instrumentation (B=16 + train bench)
step bench16 3 bench_to b16.json

# 2. batch-scaling study with the carried preconditioner (VERDICT r3 next #3)
step nuig32   3 bench_to nuig_b32.json HEXPYRO_BENCH_B=32 HEXPYRO_BENCH_SKIP_TRAIN=1
step nuig64   3 bench_to nuig_b64.json HEXPYRO_BENCH_B=64 HEXPYRO_BENCH_SKIP_TRAIN=1
step jet16    3 bench_to jet_b16.json  HEXPYRO_BENCH_MECH=JetSurf HEXPYRO_BENCH_B=16 HEXPYRO_BENCH_SKIP_TRAIN=1
step jet64    3 bench_to jet_b64.json  HEXPYRO_BENCH_MECH=JetSurf HEXPYRO_BENCH_B=64 HEXPYRO_BENCH_SKIP_TRAIN=1
step llnl16   3 bench_to llnl_b16.json HEXPYRO_BENCH_MECH=LLNL HEXPYRO_BENCH_B=16 HEXPYRO_BENCH_SKIP_TRAIN=1
step llnl64   3 bench_to llnl_b64.json HEXPYRO_BENCH_MECH=LLNL HEXPYRO_BENCH_B=64 HEXPYRO_BENCH_SKIP_TRAIN=1

# 3. regenerate the train bench's real dataset (flagship cases 1-64) + commit copy
step benchds 4 python scripts/round4_tasks.py benchds

# 4. LLNL Eoff 4D 400-case sweep (C15 reference-exact deploy truth set)
step eoff4d-sweep 6 python scripts/round4_tasks.py eoff4d-sweep

# 5. CPU tail: variable-geometry time-MLP + the 400-case deploy
step eoff4d-mlp 2 env HEXPYRO_PLATFORM=cpu python scripts/round4_tasks.py eoff4d-mlp
step eoff4d-deploy 2 env HEXPYRO_PLATFORM=cpu python scripts/round4_tasks.py eoff4d-deploy

echo "=== round-4 queue complete ($(date +%T))"
