#!/usr/bin/env python
"""Production-path sweep throughput bench: stage_simulate cases/s, one JSON line.

Unlike bench.py (one monolithic B-wide batch of the raw f32 solver), this
times the SHIPPING configuration: chunked windowed sweep including the f64
rescue pass -- the number a user generating a dataset actually gets. It is
the vehicle for (a) the stiffness-ordered batch-composition A/B
(PipelineConfig.sort_by_T0; VERDICT r4 next-step #4) and (b) the honest
LLNL row (raw-f32 B=16 leaves lanes unconverged; production always routes
them through the rescue -- VERDICT r4 next-step #6).

Usage (env-driven, composes with scripts/bench_queue.sh):
  HEXPYRO_SWEEP_MECH=NUIGMech1.1 HEXPYRO_SWEEP_N=64 HEXPYRO_SWEEP_CHUNK=16 \
  HEXPYRO_SORT_CASES=1 python scripts/sweep_bench.py
Env: HEXPYRO_SWEEP_{MECH,N,CHUNK,WINDOW,MODE(off|on),RESCUE(0|1)}.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hexpyro.pipeline.config import PipelineConfig


def main():
    mech = os.environ.get("HEXPYRO_SWEEP_MECH", "NUIGMech1.1")
    n = int(os.environ.get("HEXPYRO_SWEEP_N", "64"))
    chunk = int(os.environ.get("HEXPYRO_SWEEP_CHUNK", "16"))
    window = int(os.environ.get("HEXPYRO_SWEEP_WINDOW", "100"))
    energy_on = os.environ.get("HEXPYRO_SWEEP_MODE", "off") == "on"
    rescue = os.environ.get("HEXPYRO_SWEEP_RESCUE", "1") not in ("", "0")
    sort_cases = os.environ.get("HEXPYRO_SORT_CASES", "0") not in ("", "0")

    tmp = tempfile.mkdtemp(prefix="sweep_bench_")
    cfg = PipelineConfig(
        mechanism=mech, energy_on=energy_on, dims=2, n_cases=n, seed=2024,
        out_root=tmp, dtype="f32", chunk_size=chunk, window=window,
        rescue=rescue, sort_by_T0=sort_cases,
    )
    try:
        import contextlib

        import jax

        if os.environ.get("HEXPYRO_PLATFORM"):
            jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
        # early device op + stderr marker for bench_queue's init-hang watchdog
        # (same protocol as bench.py)
        import jax.numpy as jnp

        t0 = time.time()
        jax.block_until_ready(jnp.zeros((8,), jnp.float32) + 1.0)
        print(f"bench: device ready in {time.time() - t0:.1f} s",
              file=sys.stderr, flush=True)

        from hexpyro.pipeline import stages
        from hexpyro.sampling import lhs

        cases = lhs.sample_2d(n, seed=cfg.seed)
        # warmup: one chunk in a scratch dir pays tracing + compile (persistent
        # cache makes later reps cheap, but rep 1 of each graph shape would
        # otherwise fold a 100-1000 s compile into cases/s)
        wtmp = tempfile.mkdtemp(prefix="sweep_bench_warm_")
        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            stages.stage_simulate(
                cfg.with_overrides(out_root=wtmp, n_cases=chunk),
                cases=cases[:chunk], verbose=False,
            )
        warm_s = time.time() - t0
        shutil.rmtree(wtmp, ignore_errors=True)
        t0 = time.time()
        # progress lines -> stderr so stdout stays one parseable JSON line
        with contextlib.redirect_stdout(sys.stderr):
            stages.stage_simulate(cfg, cases=cases, verbose=True)
        elapsed = time.time() - t0
        d = np.load(f"{cfg.dataset_dir}/solver_diagnostics.npz")
        out = {
            "metric": "production PFR sweep cases/s (stage_simulate incl. rescue)",
            "cases_per_s": round(n / elapsed, 4),
            "elapsed_s": round(elapsed, 1),
            "warmup_compile_s": round(warm_s, 1),
            "mechanism": mech,
            "mode": cfg.mode,
            "n_cases": n,
            "chunk": chunk,
            "window": window,
            "sorted_by_T0": sort_cases,
            "rescue": rescue,
            "n_unconverged": int(d["n_unconverged"]),
            "max_resid": round(float(np.nanmax(d["case_max_resid"])), 2),
            "newton_iters_per_segment": round(float(d["newton_iters"].mean()), 3),
            "jac_refreshes_per_segment": round(float(d["jac_refreshes"].mean()), 4),
            "lu_rescues_total": int(d["prec_rescues"].sum()),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
