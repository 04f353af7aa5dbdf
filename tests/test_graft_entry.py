"""Driver-contract tests for __graft_entry__.

Run in subprocesses with XLA_FLAGS/JAX_PLATFORMS stripped so they exercise the
entry points exactly the way the driver does: a fresh interpreter with no
platform provisioning. dryrun_multichip must self-provision the virtual CPU
mesh (round-1 MULTICHIP failure: it initialized the real TPU and died on
libtpu version skew).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(snippet: str) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # keep the subprocess off the real TPU so this test is hermetic on any host;
    # dryrun_multichip itself must force CPU regardless (asserted below)
    env["HEXPYRO_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c", snippet],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_entry_compiles_and_runs():
    r = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert np.isfinite(np.asarray(out)).all(), 'non-finite entry output'\n"
        "print('entry ok', np.asarray(out).shape)\n"
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "entry ok" in r.stdout


def test_dryrun_multichip_self_provisions_8_devices():
    # no jax import, no platform setup: the entry must provision everything
    r = _run(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "import jax\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "assert jax.devices()[0].platform == 'cpu', jax.devices()[0]\n"
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip ok" in r.stdout
