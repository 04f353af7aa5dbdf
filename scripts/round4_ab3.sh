#!/bin/bash
# Round-4 A/B, part 3: attacks ranked by the in-graph kernel microbenchmark
# (scripts/rescue_kernel_micro2.py at (16, 924, 924) on v5e: LU-then-inverse
# 20.3 ms, QR-then-inverse 18.0 ms, matmul HIGHEST 1.10 ms vs DEFAULT 0.14 ms,
# 1-RHS triangular solve 2.0 ms):
#   jacdef   Jacobian-build contractions at DEFAULT precision (1 bf16 MXU
#            pass instead of 6) -- the FLOP-dominant refresh kernel, ~ +9%
#            if iteration counts hold;
#   qr       QR-based rescue inverse (R^-1 Q^T, one triangular solve), ~ +3%;
#   rich2    richardson_iters=2 (5 matvecs/Newton-iter instead of 7), risky;
#   combo    the winners combined (run after inspecting the arms; default
#            jacdef+qr here, edit if rich2 wins too).
#
# Usage: nohup bash scripts/round4_ab3.sh > /tmp/round4_ab3.log 2>&1 &
set -u
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 60; done
trap 'rmdir "$LOCK"' EXIT
mkdir -p runs/bench_r4

run_arm() {  # run_arm <outfile> <opts-json>
  local out=$1 opts=$2
  for i in 1 2; do
    echo "=== [$out] attempt $i ($(date +%T)) opts=$opts"
    env HEXPYRO_BENCH_SKIP_TRAIN=1 HEXPYRO_BENCH_OPTS="$opts" \
      python bench.py > "runs/bench_r4/$out" \
      && grep -q '"value"' "runs/bench_r4/$out" \
      && { echo "=== [$out] OK ($(date +%T))"; return 0; }
    sleep 20
  done
  echo "=== [$out] FAILED -- continuing"
}

run_arm ab3_jacdef.json '{"jac_precision": "default"}'
run_arm ab3_qr.json     '{"rescue_kind": "qr"}'
run_arm ab3_rich2.json  '{"richardson_iters": 2}'
run_arm ab3_combo.json  '{"jac_precision": "default", "rescue_kind": "qr"}'

echo "=== round-4 A/B part 3 complete ($(date +%T))"
