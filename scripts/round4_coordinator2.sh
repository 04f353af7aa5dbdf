#!/bin/bash
# Round-4 TPU queue, part 2: resume after llnl64 aborted part 1.
#
# llnl64 faulted the chip (UNAVAILABLE) on all 6 bench attempts, including the
# bench's internal retry at B=16/400 -- consistent with the known failure mode
# of very large LLNL graphs on this tunnel (see CLAUDE.md: window=100 faults
# TPU on LLNL Eon 4D). The scaling point is replaced with LLNL B=32 and made
# NON-fatal; everything downstream of it is independent.
#
# Usage: nohup bash scripts/round4_coordinator2.sh > /tmp/round4_coord2.log 2>&1 &
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
mkdir "$LOCK" 2>/dev/null || { echo "another queue holds $LOCK"; exit 1; }
trap 'rmdir "$LOCK"' EXIT
cd /root/repo
mkdir -p runs/bench_r4

step() {  # step <name> <max_attempts> <cmd...>  (failure aborts the queue)
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

soft() {  # soft <name> <max_attempts> <cmd...>  (failure logged, queue continues)
  local name=$1 max=$2 i rc; shift 2
  for i in $(seq 1 "$max"); do
    echo "=== [$name] attempt $i/$max ($(date +%T)): $*"
    "$@" && { echo "=== [$name] OK ($(date +%T))"; return 0; }
    rc=$?
    echo "=== [$name] rc=$rc -- retrying in 20s"
    sleep 20
  done
  echo "=== [$name] failed after $max attempts -- continuing (non-fatal)"
  return 0
}

bench_to() {  # bench_to <outfile.json> [env overrides...]
  local out=$1; shift
  env "$@" python bench.py > "runs/bench_r4/$out"
  grep -q '"value"' "runs/bench_r4/$out"
}

# 1. LLNL scaling point at B=32 (B=64 faults the chip; non-fatal)
soft llnl32 2 bench_to llnl_b32.json HEXPYRO_BENCH_MECH=LLNL HEXPYRO_BENCH_B=32 HEXPYRO_BENCH_SKIP_TRAIN=1

# 2. regenerate the train bench's real dataset (flagship cases 1-64) + commit copy
step benchds 4 python scripts/round4_tasks.py benchds

# 3. LLNL Eoff 4D 400-case sweep (C15 reference-exact deploy truth set)
step eoff4d-sweep 6 python scripts/round4_tasks.py eoff4d-sweep

# 4. CPU tail: variable-geometry time-MLP + the 400-case deploy
step eoff4d-mlp 2 env HEXPYRO_PLATFORM=cpu python scripts/round4_tasks.py eoff4d-mlp
step eoff4d-deploy 2 env HEXPYRO_PLATFORM=cpu python scripts/round4_tasks.py eoff4d-deploy

# 5. final official bench: real-data train bench + re-warm the persistent
#    cache with the final graph so the driver's run pays no first compile
step benchfinal 3 bench_to b16_final.json

echo "=== round-4 queue part 2 complete ($(date +%T))"
