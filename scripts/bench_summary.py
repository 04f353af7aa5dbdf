"""Summarize bench A/B artifacts into one table with per-config repeat stats.

Generic successor to the per-round summarizers (VERDICT r4 weak #6 / ADVICE
round-4): reads every JSON bench line under the given directories, DEDUPES by
basename (first directory wins, so committed benchmarks/ copies shadow live
runs/ duplicates), groups `<config>_r<N>` files as repeats of <config>, and
prints per-arm rows plus per-config median +/- spread when n > 1.

Usage: python scripts/bench_summary.py [dir ...] [--csv]
       (default dirs: benchmarks/r5 runs/bench_r5)
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_arms(dirs):
    arms, seen = [], set()
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(REPO, d, "*.json"))):
            base = os.path.basename(path)
            if base in seen:
                continue
            seen.add(base)
            try:
                with open(path) as f:
                    lines = [l for l in f if l.strip().startswith("{")]
                d_ = json.loads(lines[-1]) if lines else None
            except (json.JSONDecodeError, OSError, IndexError):
                continue
            if d_ is None:
                continue
            det = d_.get("detail", {})
            perf = det.get("perf", {})
            arms.append({
                "arm": os.path.splitext(base)[0],
                "mech": det.get("mechanism", d_.get("mechanism", "?")),
                "B": det.get("batch", d_.get("chunk", 0)),
                "traj_s": d_.get("value", d_.get("cases_per_s", float("nan"))),
                "wall_s": det.get("elapsed_s", d_.get("elapsed_s", float("nan"))),
                "compile_s": det.get("compile_s", d_.get("compile_s", float("nan"))),
                "conv": det.get("converged", d_.get("converged")),
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


def config_groups(arms):
    groups = defaultdict(list)
    for a in arms:
        m = re.fullmatch(r"(.+)_r(\d+)", a["arm"])
        groups[m.group(1) if m else a["arm"]].append(a["traj_s"])
    return groups


def main():
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "benchmarks/r5", "runs/bench_r5"]
    arms = load_arms(dirs)
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
    groups = {k: v for k, v in config_groups(arms).items() if len(v) > 1}
    if groups:
        print("\nper-config repeats (median [min..max], n):")
        for k, v in sorted(groups.items()):
            sv = sorted(x for x in v if x == x)
            if not sv:
                continue
            med = sv[len(sv) // 2] if len(sv) % 2 else (
                sv[len(sv) // 2 - 1] + sv[len(sv) // 2]) / 2
            print(f"  {k}: {med:.3f} [{sv[0]:.3f}..{sv[-1]:.3f}], n={len(sv)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
