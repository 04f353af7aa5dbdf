#!/usr/bin/env python
"""Pick the fastest guardrail-passing SteadyOptions variant from an A/B log.

Reads eon_solver_ab.py output lines
  opts={...} wall=12.3s conv=16/16 iters mean=1.23 max=45 h-drift=0.123K Tout=[823.1,1292.0]
keeps the LAST line per variant (a repeat pass runs warm from the persistent
compile cache, so its wall excludes compilation), and prints the winning
variant as a HEXPYRO_STEADY_OPTS JSON string -- or nothing when the default
({}) wins or no variant clears the guardrails:

  - all 16 probe lanes converged
  - adiabatic enthalpy drift <= max(2x default, 0.5 K)
  - outlet-T envelope within 5 K of the default's (branch selection unchanged)
  - >= 10% faster than the default (otherwise not worth the config drift)

Usage: python scripts/pick_eon_opts.py /tmp/nuig_ab.log
"""

import json
import re
import sys

LINE = re.compile(
    r"opts=(\{.*?\}) wall=([0-9.]+)s conv=(\d+)/(\d+) .*"
    r"h-drift=([0-9.eE+-]+)K Tout=\[([0-9.]+),([0-9.]+)\]"
)


def main():
    rows = {}
    with open(sys.argv[1]) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                opts = m.group(1)
                rows[opts] = {
                    "wall": float(m.group(2)),
                    "conv": int(m.group(3)) == int(m.group(4)),
                    "drift": float(m.group(5)),
                    "tlo": float(m.group(6)),
                    "thi": float(m.group(7)),
                }
    base = rows.get("{}")
    if base is None:
        return  # no baseline measured; keep defaults
    best_opts, best = "{}", base
    for opts, r in rows.items():
        if not r["conv"]:
            continue
        if r["drift"] > max(2.0 * base["drift"], 0.5):
            continue
        if abs(r["tlo"] - base["tlo"]) > 5.0 or abs(r["thi"] - base["thi"]) > 5.0:
            continue
        if r["wall"] < best["wall"]:
            best_opts, best = opts, r
    if best_opts != "{}" and best["wall"] < 0.9 * base["wall"]:
        print(best_opts)


if __name__ == "__main__":
    main()
