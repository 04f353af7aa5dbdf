#!/bin/bash
# Round-3 coordinator: single owner of the remaining round-3 stages.
#
# Replaces round3_queue.sh + round3_tail.sh after a dual-queue incident
# (two concurrent queue instances from different orchestrator sessions).
# Waits for any still-running TPU children (passed as pids in
# /tmp/round3_wait.pids, one per line), then runs the remaining stages
# sequentially. Every stage is idempotent.
#
#   nohup bash scripts/round3_coordinator.sh > /tmp/round3_coord.log 2>&1 &
#
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/round3_coord.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "coordinator already running (remove $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK"' EXIT

if [ -f /tmp/round3_wait.pids ]; then
  while read -r pid; do
    [ -n "$pid" ] || continue
    while [ -d "/proc/$pid" ]; do sleep 30; done
    echo "=== [$(date +%H:%M:%S)] waited out pid $pid"
  done < /tmp/round3_wait.pids
fi

step() {  # step <name> <cmd...>; returns the command's rc
  echo "=== [$(date +%H:%M:%S)] $1"
  local name="$1"
  shift
  "$@"
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] $name exited rc=$rc"
  return $rc
}

# TPU stages first. The sweep resume comes first: a prior instance hung on a
# device call at 592/800 (host CPU frozen ~25 min); restart-by-construction
# skips finished chunks. `timeout` bounds any repeat hang; re-running after a
# timeout kill resumes where it stopped, so loop it a few times.
for attempt in 1 2 3 4; do
  step "wide requalify sweep (attempt $attempt)" \
    timeout 4500 python scripts/wide_requalify.py sweep && break
done
step "wide requalify fix"   python scripts/wide_requalify.py fix
step "wide spotcheck"       python scripts/wide_requalify.py spotcheck
step "llnl-eon 4d time-mlp sweep" python scripts/validation_container.py mlp4d-sweeps eon
step "nuig-eon package"     python scripts/flagship_finish.py eon NUIGMech1.1

# CPU stages
step "wide revalidate"      env HEXPYRO_PLATFORM=cpu python scripts/wide_requalify.py revalidate
step "mlp4d train"          env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py mlp4d-train eon
step "container eon figure" env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py figures eon

echo "=== coordinator complete"
