#!/bin/bash
# Round-3 coordinator: single owner of the remaining round-3 stages.
#
# Waits for any still-running TPU children (pids in /tmp/round3_wait.pids,
# one per line), then runs the remaining stages sequentially. Every stage is
# idempotent / restart-by-construction.
#
#   nohup bash scripts/round3_coordinator.sh > /tmp/round3_coord.log 2>&1 &
#
# NB pid hygiene: verify the coordinator tree via /proc/*/cmdline scans, not
# via the launcher's $! (an earlier kill hit a wrapper pid and left the real
# coordinator running, yielding two concurrent instances).
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

# --- TPU stages ---
# Wide requalify sweep resume: bounded attempts (an earlier instance hung on
# a device call mid-window; chunked execution resumes from finished files).
for attempt in 1 2 3 4; do
  step "wide sweep (attempt $attempt)" \
    timeout 5400 python scripts/wide_requalify.py sweep && break
done
step "wide fix"       python scripts/wide_requalify.py fix
step "wide spotcheck" python scripts/wide_requalify.py spotcheck
for attempt in 1 2; do
  step "llnl-eon 4d time-mlp sweep (attempt $attempt)" \
    timeout 5400 python scripts/validation_container.py mlp4d-sweeps eon && break
done
# NUIG Eon packaging normally runs before this script (guard: examples dir)
if [ ! -d examples/flagship_nuig_800_eon ]; then
  step "nuig-eon package" python scripts/flagship_finish.py eon NUIGMech1.1
fi

# --- CPU stages ---
step "wide revalidate"      env HEXPYRO_PLATFORM=cpu python scripts/wide_requalify.py revalidate
step "mlp4d train"          env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py mlp4d-train eon
step "container eon figure" env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py figures eon

echo "=== coordinator complete"
