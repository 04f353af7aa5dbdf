"""bench.py preempts the advertised TPU job; stages must advertise correctly."""

import os
import subprocess
import sys

from hexpyro.pipeline import tpulock


def test_advertise_writes_own_pid(tmp_path, monkeypatch):
    pidfile = str(tmp_path / "tpu_job.pid")
    monkeypatch.setattr(tpulock, "TPU_JOB_PIDFILE", pidfile)
    monkeypatch.delenv("HEXPYRO_PLATFORM", raising=False)
    tpulock.advertise_resumable_tpu_job()
    assert int(open(pidfile).read()) == os.getpid()
    tpulock._clear_own_advertisement()
    assert not os.path.exists(pidfile)


def test_cpu_jobs_do_not_advertise(tmp_path, monkeypatch):
    pidfile = str(tmp_path / "tpu_job.pid")
    monkeypatch.setattr(tpulock, "TPU_JOB_PIDFILE", pidfile)
    monkeypatch.setenv("HEXPYRO_PLATFORM", "cpu")
    tpulock.advertise_resumable_tpu_job()
    assert not os.path.exists(pidfile)


def test_clear_leaves_foreign_pid(tmp_path, monkeypatch):
    # a later job overwrote the file; our atexit hook must not remove it
    pidfile = str(tmp_path / "tpu_job.pid")
    monkeypatch.setattr(tpulock, "TPU_JOB_PIDFILE", pidfile)
    with open(pidfile, "w") as f:
        f.write(str(os.getpid() + 1))
    tpulock._clear_own_advertisement()
    assert os.path.exists(pidfile)


def test_atexit_clears_on_process_exit(tmp_path):
    pidfile = str(tmp_path / "tpu_job.pid")
    code = (
        "import hexpyro.pipeline.tpulock as t, os, sys\n"
        f"t.TPU_JOB_PIDFILE = {pidfile!r}\n"
        "t.advertise_resumable_tpu_job()\n"
        "assert os.path.exists(t.TPU_JOB_PIDFILE)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "HEXPYRO_PLATFORM"}
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(__file__)))
    assert not os.path.exists(pidfile)
