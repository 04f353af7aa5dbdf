#!/bin/bash
# Generic interleaved A/B queue for TPU bench experiments.
#
# Replaces the per-round round{3,4}_ab*.sh one-shots (VERDICT r4 weak #6):
# the arm list is DATA, the queue mechanics (TPU lock, per-arm timeout,
# 60 s client-churn cool-down, interleaved reps) live here once.
#
# Usage: bash scripts/bench_queue.sh <arms.tsv> <outdir> [reps] [timeout_s]
#
# arms.tsv: one arm per line,  <name><TAB><command...>
#   - command runs via bash -c with stdout -> <outdir>/<name>_r<rep>.json
#   - lines starting with '#' and blank lines are skipped
# Reps are INTERLEAVED (all arms rep 1, then all arms rep 2, ...) so config
# effects separate from session drift; every run is followed by a 60 s sleep
# (opening a new TPU client within ~30 s of the previous exit hangs device
# init -- CLAUDE.md) and bounded by the timeout (default 900 s).
#
# Example arms.tsv:
#   base	HEXPYRO_BENCH_SKIP_TRAIN=1 python bench.py
#   jacdef	HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS='{"jac_precision": "default"}' python bench.py
set -u
ARMS=${1:?arms.tsv}
OUTDIR=${2:?outdir}
REPS=${3:-3}
TIMEOUT=${4:-900}
LOCK=/tmp/hexpyro_tpu_queue.lock
cd "$(dirname "$0")/.."
mkdir -p "$OUTDIR"
until mkdir "$LOCK" 2>/dev/null; do sleep 30; done
trap 'rmdir "$LOCK"' EXIT

for rep in $(seq 1 "$REPS"); do
  while IFS=$'\t' read -r name cmd; do
    [ -z "$name" ] && continue
    case "$name" in \#*) continue ;; esac
    out="$OUTDIR/${name}_r${rep}.json"
    if [ -s "$out" ] && grep -q '"value"\|"cases_per_s"' "$out"; then
      echo "=== [$name r$rep] exists, skipping"
      continue
    fi
    echo "=== [$name r$rep] start ($(date +%T)): $cmd"
    timeout "$TIMEOUT" bash -c "$cmd" > "$out" 2>>"$OUTDIR/queue_err.log"
    if grep -q '"value"\|"cases_per_s"' "$out"; then
      echo "=== [$name r$rep] OK ($(date +%T))"
    else
      echo "=== [$name r$rep] FAILED ($(date +%T)) -- continuing"
    fi
    sleep 60  # TPU client-churn cool-down (CLAUDE.md)
  done < "$ARMS"
done
echo "=== queue complete ($(date +%T))"
