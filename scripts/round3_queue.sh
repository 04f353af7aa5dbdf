#!/bin/bash
# SUPERSEDED by round3_coordinator.sh — do not launch a second instance;
# check for live queue/coordinator processes (list /proc/*/cmdline) first.
#
# Round-3 TPU work queue: runs the remaining pipeline stages sequentially so
# the chip never idles and the build survives orchestrator-session restarts.
# Every stage is idempotent (skips existing artifacts), so re-running this
# script resumes wherever the previous invocation stopped.
#
#   nohup bash scripts/round3_queue.sh > /tmp/round3_queue.log 2>&1 &
#
# Queue:
#   1. NUIG Eon 800-case training sweep            (TPU)
#   2. NUIG Eon 400-case independent sweep         (TPU)
#   3. NUIG Eon temp(600ep)+time MLPs              (TPU, minutes)
#   4. Validation-container Eon priority truth cases (TPU)
#   5. LLNL Eon 400-case 4D sweep for the 4D time-MLP (TPU)
#   6. Wide requalification sweep + f64 fix        (TPU)
#   7. NUIG Eon CRNN training to the anchors       (TPU, hours; resumable)
#   8. NUIG Eon finisher if the anchors are not yet beaten
#
# CPU-side stages (MLP4D train, wide spotcheck/revalidate, figures,
# packaging) are run separately with HEXPYRO_PLATFORM=cpu.

set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/round3_queue.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "queue already running (remove $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK"' EXIT

# wait for any pre-existing sweep this queue replaces
if [ -f /tmp/nuig_sweep.pid ]; then
  pid=$(cat /tmp/nuig_sweep.pid)
  while [ -d "/proc/$pid" ]; do sleep 20; done
fi

step() {  # step <name> <cmd...>
  echo "=== [$(date +%H:%M:%S)] $1"
  shift
  "$@"
  echo "=== [$(date +%H:%M:%S)] done (rc=$?)"
}

step "nuig-eon sweep"  python scripts/flagship_nuig_eon.py sweep
step "nuig-eon indep"  python scripts/flagship_nuig_eon.py indep
step "nuig-eon mlps"   python scripts/flagship_nuig_eon.py mlp
step "container eon priority" python scripts/container_priority.py eon
# Critical path first: the NUIG Eon CRNN is the last unmatched reference
# anchor (train early-stops once both anchors are beaten; finisher otherwise).
step "nuig-eon crnn train" python scripts/flagship_train.py eon 600 NUIGMech1.1
step "nuig-eon finisher" python scripts/finish_eon.py NUIGMech1.1
step "wide requalify sweep" python scripts/wide_requalify.py sweep
step "wide requalify f64 fix" python scripts/wide_requalify.py fix
step "llnl-eon 4d time-mlp sweep" python scripts/validation_container.py mlp4d-sweeps eon
echo "=== queue complete"
