#!/bin/bash
# Round-3 tail: packaging and figure steps that depend on the round3_queue.sh
# TPU stages. Chain it behind the queue:
#
#   nohup bash -c 'while [ -d /tmp/round3_queue.lock ]; do sleep 60; done; \
#     bash scripts/round3_tail.sh' > /tmp/round3_tail.log 2>&1 &
#
# Every step is idempotent (skips existing artifacts).

set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/round3_tail.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "tail already running (remove $LOCK to override)"; exit 1
fi
trap 'rmdir "$LOCK"' EXIT

step() {  # step <name> <cmd...>
  echo "=== [$(date +%H:%M:%S)] $1"
  shift
  "$@"
  echo "=== [$(date +%H:%M:%S)] done (rc=$?)"
}

# NUIG Eon flagship packaging: deploy on training + independent sweeps,
# MLP eval figures, copy to examples/flagship_nuig_800_eon/
step "nuig-eon package" python scripts/flagship_finish.py eon NUIGMech1.1

# Wide requalification evidence: f64 spotcheck of the coldest remaining f32
# case, then wide-CRNN losses on the corrected dataset
step "wide spotcheck"   python scripts/wide_requalify.py spotcheck
step "wide revalidate"  python scripts/wide_requalify.py revalidate

# Held-out 4D container, Eon pairing: LLNL Eon 4D time-MLP (CPU train on the
# queue's sweep), then the C18 JetSurf-vs-LLNL Eon two-model figure
step "mlp4d train"  env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py mlp4d-train eon
step "container eon figure" env HEXPYRO_PLATFORM=cpu python scripts/validation_container.py figures eon

echo "=== tail complete"
