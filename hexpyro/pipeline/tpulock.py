"""Advertise long TPU-holding pipeline jobs so bench.py can preempt them.

The axon TPU is exclusive per process. bench.py (run by the driver at round
end) reads /tmp/hexpyro_tpu_job.pid and SIGTERMs the advertised job — safe
because every pipeline stage is restart-by-construction (stage_simulate
resumes from chunk files, train_crnn from per-epoch checkpoints; see
bench.py:_preempt_resumable_tpu_job for the verification it performs before
killing). Without the advertisement the bench would fault on device init
while a sweep or training run holds the chip.
"""

from __future__ import annotations

import atexit
import os

TPU_JOB_PIDFILE = "/tmp/hexpyro_tpu_job.pid"


def advertise_resumable_tpu_job() -> None:
    """Record this PID as a preemptible TPU holder.

    No-op for explicitly-CPU jobs (HEXPYRO_PLATFORM=cpu) — they don't hold
    the chip. Idempotent; the file is cleared at interpreter exit if it still
    names this process (a later job may have legitimately overwritten it).
    """
    if os.environ.get("HEXPYRO_PLATFORM", "").startswith("cpu"):
        return
    try:
        with open(TPU_JOB_PIDFILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        return
    atexit.register(_clear_own_advertisement)


def _clear_own_advertisement() -> None:
    try:
        with open(TPU_JOB_PIDFILE) as f:
            if int(f.read().strip()) == os.getpid():
                os.remove(TPU_JOB_PIDFILE)
    except (OSError, ValueError):
        pass
