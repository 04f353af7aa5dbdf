"""Summarize round-4 bench A/B artifacts into one table.

Reads every JSON bench line under benchmarks/r4/ and runs/bench_r4/ and
prints a per-arm table (throughput, wall, compile, Newton/refresh/rescue
counters, achieved GFLOP/s) plus, for the part-4 interleaved reps, the
per-config mean +/- spread so the config effect can be separated from
session variance (VERDICT r3 weak #1 / next-step #3).

Usage: python scripts/summarize_r4.py [--csv]
"""
from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_arms():
    arms = []
    for pat in ("benchmarks/r4/*.json", "runs/bench_r4/*.json"):
        for path in sorted(glob.glob(os.path.join(REPO, pat))):
            try:
                with open(path) as f:
                    d = json.load(f)
            except (json.JSONDecodeError, OSError):
                continue
            det = d.get("detail", {})
            perf = det.get("perf", {})
            arms.append({
                "arm": os.path.splitext(os.path.basename(path))[0],
                "mech": det.get("mechanism", "?"),
                "B": det.get("batch", 0),
                "traj_s": d.get("value", float("nan")),
                "wall_s": det.get("elapsed_s", float("nan")),
                "compile_s": det.get("compile_s", float("nan")),
                "conv": det.get("converged", None),
                "newton": perf.get("newton_iters_total"),
                "refresh": perf.get("jac_refreshes_total"),
                "rescue": perf.get("lu_rescues_total"),
                "gflops": perf.get("achieved_f32_gflops"),
                "mfu": perf.get("mfu_vs_f32_highest_peak"),
            })
    return arms


def fmt(v, nd=2):
    if v is None:
        return "-"
    if isinstance(v, bool):
        return "yes" if v else "NO"
    if isinstance(v, float):
        return f"{v:.{nd}f}"
    return str(v)


def main():
    arms = load_arms()
    if not arms:
        print("no bench artifacts found", file=sys.stderr)
        return 1
    cols = ["arm", "mech", "B", "traj_s", "wall_s", "compile_s", "conv",
            "newton", "refresh", "rescue", "gflops", "mfu"]
    if "--csv" in sys.argv:
        print(",".join(cols))
        for a in arms:
            print(",".join(fmt(a[c]) for c in cols))
    else:
        widths = {c: max(len(c), max(len(fmt(a[c])) for a in arms)) for c in cols}
        print("  ".join(c.ljust(widths[c]) for c in cols))
        for a in arms:
            print("  ".join(fmt(a[c]).ljust(widths[c]) for c in cols))

    # Part-4 interleaved reps: group ab4_<config>_r<rep> by config.
    groups = defaultdict(list)
    for a in arms:
        name = a["arm"]
        if name.startswith("ab4_") and "_r" in name[4:]:
            cfg = name[4:name.rindex("_r")]
            groups[cfg].append(a["traj_s"])
    if groups:
        print("\npart-4 interleaved reps (config effect vs session variance):")
        for cfg, vals in sorted(groups.items()):
            vals = [v for v in vals if v == v]
            if not vals:
                continue
            mean = sum(vals) / len(vals)
            spread = (max(vals) - min(vals)) if len(vals) > 1 else 0.0
            print(f"  {cfg:10s} n={len(vals)}  mean {mean:.3f} traj/s  "
                  f"min {min(vals):.3f}  max {max(vals):.3f}  spread {spread:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
