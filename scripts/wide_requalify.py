#!/usr/bin/env python
"""Requalify the wide-range LLNL Eoff sweep to the 1% accuracy target.

Round 2 left 109/800 wide cases with stall-accepted (unconverged) segments;
the coldest case (T0=820.2 K) measured 1.14e-2 max rel-to-peak vs f64, above
the 1%-of-reference target (VALIDATION.md, VERDICT r2 weak #2). The rescue
pass now also triggers on the convergence flag (stages.py), so re-sweeping
re-solves exactly those cases at f64.

Steps (idempotent):
  python scripts/wide_requalify.py sweep      # TPU: re-sweep with the rescue
  python scripts/wide_requalify.py fix        # TPU: force-f64 the K coldest
                                              # cases (HEXPYRO_WIDE_FIX_K=32)
  python scripts/wide_requalify.py spotcheck  # f64 re-solve of the coldest
                                              # case vs the dataset txt
                                              # (HEXPYRO_SPOT_RANK=k checks
                                              # the (k+1)-th coldest instead)
  python scripts/wide_requalify.py revalidate # wide CRNN losses on the
                                              # corrected dataset

The fix step exists because the rescue trigger (residual OR convergence flag)
is necessary but not sufficient for the 1% target at the cold edge: the
coldest case CONVERGES at f32 yet measures 1.091e-2 rel-to-peak vs CPU f64
(near-frozen chemistry -> tiny trace-species peaks). Forcing the coldest K
through the f64 rescue writer makes those entries f64-grade; the spotcheck at
rank K then bounds every remaining f32 case.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# JAX_PLATFORMS env is ignored by this build (CLAUDE.md); honor the
# HEXPYRO_PLATFORM convention so the CPU-lane revalidate doesn't try to grab
# the (held) TPU and die on backend init
if os.environ.get("HEXPYRO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])

import numpy as np

from hexpyro.pipeline import artifacts, stages
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.sampling import lhs

ROOT = "runs/flagship_llnl_wide"
BACKUP = f"{ROOT}/datasets/2D_off_wide_r2"


def make_cfg():
    return PipelineConfig(
        mechanism="LLNL", wide=True, n_cases=800, out_root=ROOT,
        dtype="f32", chunk_size=int(os.environ.get("HEXPYRO_SWEEP_CHUNK", "16")), window=25,
    )


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = make_cfg()
    os.makedirs(ROOT, exist_ok=True)
    # the wide draw (seed 2024, wide bounds) reproduces the reference's
    # checked-in sampling_case_wide_2D.csv bit-for-bit; regenerate if the
    # run directory was reset
    if not os.path.exists(cfg.cases_csv):
        stages.stage_sample(cfg)

    if step in ("sweep", "all"):
        # keep the round-2 dataset for diffing; re-sweep fresh so the
        # per-case diagnostics + convergence-keyed rescue apply end to end.
        # Only a COMPLETE 800-case dataset is moved aside: an in-progress
        # re-sweep must resume, not be archived (a partial dir was once moved
        # into BACKUP on restart, silently restarting the sweep from zero)
        if os.path.exists(cfg.dataset_dir) and not os.path.exists(BACKUP):
            # completeness = every expected trajectory filename exists (a count
            # of arbitrary *.txt could be fooled by stray notes/log files into
            # archiving a partial sweep -- the silent-restart-from-zero failure
            # this guard prevents)
            complete = all(
                os.path.exists(os.path.join(
                    cfg.dataset_dir,
                    artifacts.trajectory_case_filename("LLNL", False, k + 1)))
                for k in range(cfg.n_cases)
            )
            if complete:
                shutil.move(cfg.dataset_dir, BACKUP)
        stages.stage_simulate(cfg)
        z = np.load(f"{cfg.dataset_dir}/solver_diagnostics.npz")
        print(f"[wide-requalify] unconverged after rescue: "
              f"{int(z['n_unconverged'])}, max resid "
              f"{np.nanmax(z['case_max_resid']):.3g}")

    if step == "fix":
        K = int(os.environ.get("HEXPYRO_WIDE_FIX_K", "32"))
        cases = lhs.read_cases_csv(cfg.cases_csv)[: cfg.n_cases]
        coldest = np.argsort(cases[:, 0])[:K]
        print(f"[wide-requalify] forcing f64 on the {K} coldest cases "
              f"(T0 {cases[coldest, 0].min():.1f}-"
              f"{cases[coldest, 0].max():.1f} K)")
        stages.stage_simulate(cfg, only_ids=coldest, force_f64_ids=coldest)

    if step in ("spotcheck", "all"):
        import jax

        # without this the "f64" reference solve silently truncates to f32
        # (jnp.float64 requests downgrade with a UserWarning) and the check
        # measures solver-option sensitivity, not accuracy vs f64
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        from hexpyro.mechanism import load_mechanism, to_device_arrays
        from hexpyro.reactors.cstr import default_steady_options
        from hexpyro.reactors.pfr import simulate_pfr, tracked_indices

        cases = lhs.read_cases_csv(cfg.cases_csv)[: cfg.n_cases]
        # rank 0 = coldest; after `fix`, rank K bounds the coldest UNFIXED case
        rank = int(os.environ.get("HEXPYRO_SPOT_RANK", "0"))
        worst = int(np.argsort(cases[:, 0])[rank])
        mech = load_mechanism(cfg.mech_path, name="LLNL")
        arr64 = to_device_arrays(mech, dtype=jnp.float64)
        tracked = tracked_indices(mech.species_names)
        fn = jax.jit(
            lambda T0, P0: simulate_pfr(
                arr64, T0, P0, species_names=mech.species_names,
                n_steps=cfg.n_steps, opts=default_steady_options(jnp.float64),
            )
        )
        traj = fn(jnp.asarray([cases[worst, 0]], jnp.float64),
                  jnp.asarray([cases[worst, 1] * 1e5], jnp.float64))
        C64 = np.asarray(traj.concentrations(arr64))[0][:, tracked]  # (801, 9)
        d = artifacts.read_trajectory_txt(os.path.join(
            cfg.dataset_dir,
            artifacts.trajectory_case_filename("LLNL", False, worst + 1)))
        rel = np.abs(d["C"] - C64) / np.maximum(np.abs(C64).max(0), 1e-30)
        print(f"[wide-requalify] rank-{rank} coldest case {worst + 1} "
              f"(T0={cases[worst, 0]:.1f} K): max rel-to-peak vs f64 = "
              f"{rel.max():.3e} (target <= 1e-2)")

    if step in ("revalidate", "all"):
        from hexpyro.surrogate.crnn import config_for
        from hexpyro.training import crnn_trainer as ct

        ds = ct.load_crnn_dataset(stages._dataset_paths(cfg))
        ccfg = config_for("LLNL", variant="wide")
        tcfg = ct.CRNNTrainConfig(rtol=1e-4, atol=1e-6,
                                  max_steps_per_interval=4)
        npz = f"{ROOT}/crnn/training_history_LLNL_Eoff_wide.npz"
        with np.load(npz, allow_pickle=True) as z:
            p = np.asarray(z["updated_p"])
        train_idx, valid_idx, _ = ct.make_splits(ds.tsteps.shape[0],
                                                 tcfg.split_seed)
        import jax.numpy as jnp

        def loss(idx):
            i = np.asarray(idx)
            return float(ct.batch_loss(
                jnp.asarray(p, jnp.float32), ccfg,
                jnp.asarray(ds.tsteps[i], jnp.float32),
                jnp.asarray(ds.Tlist[i], jnp.float32),
                jnp.asarray(ds.u0[i], jnp.float32),
                jnp.asarray(ds.ylabel[i], jnp.float32),
                jnp.asarray(ds.yscale[i], jnp.float32), tcfg))

        tr, va = loss(train_idx), loss(valid_idx)
        print(f"[wide-requalify] wide CRNN on corrected dataset: "
              f"train {tr:.6f} valid {va:.6f} "
              f"(reference anchors 2.419e-3/2.337e-3)")


if __name__ == "__main__":
    main()
