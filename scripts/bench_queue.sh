#!/bin/bash
# Generic interleaved A/B queue for TPU bench experiments.
#
# Replaces the per-round round{3,4}_ab*.sh one-shots (VERDICT r4 weak #6):
# the arm list is DATA, the queue mechanics (TPU lock, init-hang watchdog,
# per-arm timeout, 60 s client-churn cool-down, interleaved reps) live here.
#
# Usage: bash scripts/bench_queue.sh <arms.tsv> <outdir> [reps] [timeout_s]
#
# arms.tsv: one arm per line,  <name><TAB><command...>
#   - command runs via bash -c; stdout -> <outdir>/<name>_r<rep>.json,
#     stderr -> <outdir>/<name>_r<rep>.err
#   - lines starting with '#' and blank lines are skipped
# Reps are INTERLEAVED (all arms rep 1, then all arms rep 2, ...) so config
# effects separate from session drift; every run is followed by a 60 s sleep
# (opening a new TPU client within ~30 s of the previous exit hangs device
# init -- CLAUDE.md) and bounded by the timeout (default 1200 s).
#
# Init-hang watchdog: bench.py and sweep_bench.py print "device ready" to
# stderr as their first device op. The documented axon hang blocks there
# silently with ~0 CPU; if the marker has not appeared after
# HEXPYRO_QUEUE_INIT_TIMEOUT (default 300) seconds the arm's process group is
# killed so a hang costs 5 minutes, not the full arm timeout. Failed/hung
# arms stay failed for the rep (re-run the queue to fill gaps: completed
# artifacts are skipped).
set -u
ARMS=${1:?arms.tsv}
OUTDIR=${2:?outdir}
REPS=${3:-3}
TIMEOUT=${4:-1200}
INIT_TIMEOUT=${HEXPYRO_QUEUE_INIT_TIMEOUT:-300}
LOCK=/tmp/hexpyro_tpu_queue.lock
cd "$(dirname "$0")/.."
mkdir -p "$OUTDIR"
until mkdir "$LOCK" 2>/dev/null; do sleep 30; done
trap 'rmdir "$LOCK"' EXIT

kill_group() {  # kill_group <pid>
  kill -TERM -- "-$1" 2>/dev/null
  sleep 5
  kill -KILL -- "-$1" 2>/dev/null
}

run_arm() {  # run_arm <name> <rep> <cmd>
  local name=$1 rep=$2 cmd=$3
  local out="$OUTDIR/${name}_r${rep}.json" err="$OUTDIR/${name}_r${rep}.err"
  if [ -s "$out" ] && grep -q '"value"\|"cases_per_s"' "$out"; then
    echo "=== [$name r$rep] exists, skipping"
    return 0
  fi
  echo "=== [$name r$rep] start ($(date +%T)): $cmd"
  setsid bash -c "$cmd" > "$out" 2> "$err" &
  local pid=$! t=0 ready=0 verdict=""
  while kill -0 "$pid" 2>/dev/null; do
    sleep 5; t=$((t + 5))
    if [ "$ready" = 0 ] && grep -q "device ready" "$err" 2>/dev/null; then
      ready=1
    fi
    if [ "$ready" = 0 ] && [ "$t" -ge "$INIT_TIMEOUT" ]; then
      verdict="INIT-HANG after ${t}s"; kill_group "$pid"; break
    fi
    if [ "$t" -ge "$TIMEOUT" ]; then
      verdict="TIMEOUT after ${t}s"; kill_group "$pid"; break
    fi
  done
  wait "$pid" 2>/dev/null
  if grep -q '"value"\|"cases_per_s"' "$out" 2>/dev/null; then
    echo "=== [$name r$rep] OK ($(date +%T))"
  else
    echo "=== [$name r$rep] FAILED ${verdict:-rc} ($(date +%T)) -- continuing"
  fi
  sleep 60  # TPU client-churn cool-down (CLAUDE.md)
}

for rep in $(seq 1 "$REPS"); do
  while IFS=$'\t' read -r name cmd; do
    [ -z "$name" ] && continue
    case "$name" in \#*) continue ;; esac
    run_arm "$name" "$rep" "$cmd"
  done < "$ARMS"
done
echo "=== queue complete ($(date +%T))"
