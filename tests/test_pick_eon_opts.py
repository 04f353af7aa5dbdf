"""pick_eon_opts: A/B-log parsing + guardrailed variant selection."""

import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "pick_eon_opts.py")

LOG = """\
opts={} wall=400.0s conv=16/16 iters mean=1.2 max=40 h-drift=0.100K Tout=[823.1,1292.0]
opts={"jac_refresh_every": 4} wall=380.0s conv=16/16 iters mean=1.4 max=50 h-drift=0.120K Tout=[823.2,1292.1]
opts={} wall=42.0s conv=16/16 iters mean=1.2 max=40 h-drift=0.100K Tout=[823.1,1292.0]
opts={"jac_refresh_every": 4} wall=30.0s conv=16/16 iters mean=1.4 max=50 h-drift=0.120K Tout=[823.2,1292.1]
opts={"richardson_iters": 2} wall=25.0s conv=15/16 iters mean=1.3 max=60 h-drift=0.110K Tout=[823.0,1292.0]
opts={"ns_iters": 1} wall=28.0s conv=16/16 iters mean=1.5 max=55 h-drift=0.900K Tout=[823.4,1291.8]
opts={"stall_iters": 6} wall=39.0s conv=16/16 iters mean=1.2 max=40 h-drift=0.100K Tout=[829.0,1292.0]
"""


def _pick(log_text, tmp_path):
    p = tmp_path / "ab.log"
    p.write_text(log_text)
    out = subprocess.run([sys.executable, SCRIPT, str(p)],
                         capture_output=True, text=True, check=True)
    return out.stdout.strip()


def test_picks_fastest_guardrailed_variant(tmp_path):
    # jac_refresh_every=4 wins: faster unconverged (richardson), high-drift
    # (ns_iters), and outlet-envelope-shifted (stall_iters) variants are all
    # rejected; the LAST line per variant (warm pass) is what counts
    assert _pick(LOG, tmp_path) == '{"jac_refresh_every": 4}'


def test_default_wins_prints_nothing(tmp_path):
    log = (
        'opts={} wall=42.0s conv=16/16 iters mean=1.2 max=40 '
        'h-drift=0.100K Tout=[823.1,1292.0]\n'
        'opts={"ns_iters": 1} wall=40.0s conv=16/16 iters mean=1.5 max=55 '
        'h-drift=0.100K Tout=[823.1,1292.0]\n'
    )
    # 40.0 is not < 0.9 * 42.0: not worth the config drift -> empty output
    assert _pick(log, tmp_path) == ""


def test_no_baseline_prints_nothing(tmp_path):
    log = ('opts={"ns_iters": 1} wall=40.0s conv=16/16 iters mean=1.5 max=55 '
           'h-drift=0.100K Tout=[823.1,1292.0]\n')
    assert _pick(log, tmp_path) == ""
