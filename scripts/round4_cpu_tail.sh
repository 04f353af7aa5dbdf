#!/bin/bash
# Round-4 CPU-lane tail: runs only after the TPU measurement queue drains
# (waits on the capture_bench_cache process, the last lock holder), so host
# CPU load cannot perturb the interleaved A/B's timed windows.
#
#   1. wide_cpu_spotcheck  -- cold-edge f32-vs-TRUE-CPU-f64 bound (advisor r3
#                             finding #1 closure)
#   2. golden Eon anchors  -- required after any solver change (CLAUDE.md):
#                             eb82bcd/a1b6690 touched cstr/linalg this round
#   3. full suite          -- keep tests/ green
#
# Usage: nohup bash scripts/round4_cpu_tail.sh <tpu-queue-pid> > /tmp/round4_cpu_tail.log 2>&1 &
set -u
cd /root/repo
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
# belt-and-braces: also wait for the TPU queue lock itself
while [ -d /tmp/hexpyro_tpu_queue.lock ]; do sleep 60; done

echo "=== [1/3] wide CPU-f64 spotcheck ($(date +%T))"
HEXPYRO_SPOT_RANK=32 timeout 7200 python scripts/wide_cpu_spotcheck.py

echo "=== [2/3] golden Eon anchors ($(date +%T))"
timeout 7200 python -m pytest tests/test_golden_eon.py -m "slow or not slow" -q

echo "=== [3/3] full suite ($(date +%T))"
timeout 14400 python -m pytest tests/ -q

echo "=== round-4 CPU tail complete ($(date +%T))"
