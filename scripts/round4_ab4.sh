#!/bin/bash
# Round-4 A/B, part 4: interleaved repeats to separate CONFIG effect from
# SESSION variance. Part-3 measured identical Newton/refresh counters but 3x
# wall differences (b16_pregate 5.65 s vs ab3_jacdef 15.15 s with ~equal op
# counts), so single-shot arms cannot rank configs on this shared-tunnel chip.
#
# Trimmed from the original 4-config x3 + qr plan after the VM reset wiped the
# persistent XLA cache: each distinct graph now pays a full recompile, so the
# arms are the two AMBIGUOUS configs (jacdef, rich2 -- identical counters,
# 3x wall in part 3) interleaved with base x3 reps. Dropped: lu_panel=128
# (part 3 already measured a large, mechanistically-explained 2.8x regression,
# benchmarks/r4/ab2_p128.json) and the rescue_kind=qr quarantine (every
# qr-containing part-3 arm faulted the TPU UNAVAILABLE; deliberately faulting
# the chip minutes before the driver's round-end bench is not worth the
# determinism datum).
#
# Usage: nohup bash scripts/round4_ab4.sh > /tmp/round4_ab4.log 2>&1 &
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 30; done
trap 'rmdir "$LOCK"' EXIT
mkdir -p runs/bench_r4

run_arm() {  # run_arm <outfile> <opts-json-or-empty>
  local out=$1 opts=$2
  echo "=== [$out] start ($(date +%T)) opts=$opts"
  # timeout: a cold compile+run is ~5 min; a futex-hung device call (observed
  # on the first part-4 arm, 11 min silent) must not stall the queue
  if [ -n "$opts" ]; then
    timeout 900 env HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS="$opts" \
      python bench.py > "runs/bench_r4/$out" 2>>/tmp/round4_ab4_err.log
  else
    timeout 900 env HEXPYRO_BENCH_SKIP_TRAIN=1 \
      python bench.py > "runs/bench_r4/$out" 2>>/tmp/round4_ab4_err.log
  fi
  grep -q '"value"' "runs/bench_r4/$out" \
    && echo "=== [$out] OK ($(date +%T))" \
    || echo "=== [$out] FAILED ($(date +%T)) -- continuing"
}

for rep in 1 2 3; do
  run_arm "ab4_base_r$rep.json"   ''
  run_arm "ab4_jacdef_r$rep.json" '{"jac_precision": "default"}'
  run_arm "ab4_rich2_r$rep.json"  '{"richardson_iters": 2}'
done

echo "=== round-4 A/B part 4 complete ($(date +%T))"
