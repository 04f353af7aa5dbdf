#!/usr/bin/env python
"""Flagship CRNN training: 800-case JetSurf sweep to reference-quality loss.

Reference anchors (BASELINE.md): JetSurf Eoff train/valid MSE 5.680e-3/5.473e-3
(262 epochs), JetSurf Eon 3.035e-3/2.740e-3 (242 epochs). This run uses the
reference recipe (AdamW lr 5e-3, plateau 0.6/5, grad clip 200, split seed 42)
with TPU-shaped execution: batch 8 (vs the reference's one-case SGD; the vmap
axis is nearly free so larger batches cost the same wall clock per STEP but
8x fewer updates per epoch) and a dopri5 budget of 2 steps/interval (measured
loss-identical to 8 on this dataset; scripts/crnn_probe_timing.py).

Usage: python scripts/flagship_train.py [eoff|eon] [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HEXPYRO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
cache = "/root/.cache/jax_compile"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from hexpyro.pipeline.tpulock import advertise_resumable_tpu_job

advertise_resumable_tpu_job()  # training resumes from per-epoch checkpoints

from hexpyro.pipeline import artifacts
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.pipeline.stages import _dataset_paths
from hexpyro.surrogate import mlp as mlp_mod
from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training import crnn_trainer as ct


# reference final train losses to undercut (BASELINE.md)
TARGETS = {
    ("JetSurf", False): 5.4e-3, ("JetSurf", True): 2.9e-3,
    ("NUIGMech1.1", False): 6.0e-3, ("NUIGMech1.1", True): 1.68e-3,
    ("LLNL", False): 2.30e-3, ("LLNL", True): 1.19e-3,
    ("LLNL", "wide"): 2.35e-3,  # reference wide: 2.419e-3 (500 ep)
}
ROOTS = {"JetSurf": "", "NUIGMech1.1": "_nuig", "LLNL": "_llnl"}

# reference final valid losses to undercut (BASELINE.md); the early stop needs
# BOTH anchors beaten, not just train
VALID_TARGETS = {
    ("JetSurf", False): 5.4e-3, ("JetSurf", True): 2.7e-3,
    ("NUIGMech1.1", False): 6.1e-3, ("NUIGMech1.1", True): 1.63e-3,
    ("LLNL", False): 2.10e-3, ("LLNL", True): 1.09e-3,
    ("LLNL", "wide"): 2.30e-3,  # reference wide valid: 2.337e-3
}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "eoff"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    mech = sys.argv[3] if len(sys.argv) > 3 else "JetSurf"
    energy_on = mode == "eon"
    wide = mode == "wide"
    suffix = ROOTS[mech]
    out_root = f"runs/flagship{'_eon' if energy_on else ''}{suffix}" \
        if mech == "JetSurf" else f"runs/flagship{suffix}{'_eon' if energy_on else ''}"
    if wide:
        out_root = f"runs/flagship{suffix}_wide"
    cfg = PipelineConfig(
        mechanism=mech, n_cases=800, out_root=out_root, energy_on=energy_on,
        wide=wide,
    )
    ds = ct.load_crnn_dataset(_dataset_paths(cfg))
    if energy_on:
        # Eon recipe: substitute the measured T(t) by the temp-MLP prediction
        # (Eon_surrogate_model_training.py:118-195)
        mlp_dir = f"{out_root}/temp_mlp"
        params = artifacts.load_mlp_params_npz(f"{mlp_dir}/weights_{mech}_2D.npz")
        lo, hi = artifacts.load_minmax_scaler(f"{mlp_dir}/min_max_{mech}_2D.pkl")
        ds = ct.substitute_temp_profiles(ds, params, lo, hi)
    key = mech if mech in ("LLNL", "JetSurf") else "NUIG"
    ccfg = config_for(key, variant="wide" if wide else "default", energy_on=energy_on)
    mech_tag = "NUIG" if mech.startswith("NUIG") else mech
    m = "Eon" if energy_on else "Eoff"
    save = f"{out_root}/crnn/training_history_{mech_tag}_{m}{'_wide' if wide else ''}.npz"
    target = TARGETS[(mech, "wide" if wide else energy_on)]
    # optional plateau-LR override on resume (CRNNTrainConfig.resume_lr_scale):
    # used when the training data changed under a finished run (e.g. the wide
    # dataset requalification) and the collapsed plateau LR can't move
    rls = os.environ.get("HEXPYRO_RESUME_LR_SCALE")
    rls = float(rls) if rls else None
    if wide:
        # WIDE_Eoff recipe (WIDE_...py:16-19,383): lr 5e-4, clip 10, wd 1e-4,
        # tighter ODE tolerances (which need a larger per-interval budget)
        tcfg = ct.CRNNTrainConfig(
            epochs=epochs, learning_rate=5e-4, grad_clip=10.0, weight_decay=1e-4,
            rtol=1e-4, atol=1e-6,
            batch_size=int(os.environ.get("HEXPYRO_FLAGSHIP_BATCH", "8")),
            max_steps_per_interval=4,
            save_path=save, save_every=10, stop_at_train_loss=target,
            stop_at_valid_loss=VALID_TARGETS[(mech, "wide")],
            resume_lr_scale=rls,
        )
    else:
        # LLNL's 2.25e-3 target is ~2.5x deeper than JetSurf/NUIG's and needs
        # the reference's batch-1 SGD noise scale: batch 8 plateaus at ~7e-3
        # with a collapsed plateau LR (measured round 2), so LLNL drops to
        # batch 2 (4x the steps/epoch) with more plateau patience
        batch_env = os.environ.get("HEXPYRO_FLAGSHIP_BATCH")
        batch = int(batch_env) if batch_env else (2 if mech == "LLNL" else 8)
        tcfg = ct.CRNNTrainConfig(
            epochs=epochs,
            batch_size=batch,
            plateau_patience=8 if mech == "LLNL" else 5,
            max_steps_per_interval=2,
            save_path=save,
            save_every=10,
            stop_at_train_loss=target,
            stop_at_valid_loss=VALID_TARGETS[(mech, energy_on)],
            resume_lr_scale=rls,
        )
    # resume (params + optimizer + lr state, history append) is handled inside
    # train_crnn via tcfg.resume whenever `save` already exists
    p, hist = ct.train_crnn(init_parameters(0, ccfg), ds, ccfg, tcfg)
    tr, va = hist["train_loss"][-1], hist["valid_loss"][-1]
    # full-batch L-BFGS finish if plateau-AdamW stopped short of the anchors
    vt = VALID_TARGETS[(mech, "wide" if wide else energy_on)]
    if not (tr <= target and va <= vt):
        p, tr, va, info = ct.polish_crnn(
            np.asarray(p), ds, ccfg, tcfg, maxiter=250, eval_chunk=80,
            stop_train=target, stop_valid=vt, save_path=save,
            param_scale=ct.adam_param_scale(save + ".state.npz"),
        )
        print(f"POLISH train {tr:.6e} valid {va:.6e} ({info['status']})",
              flush=True)
    test = ct.test_crnn(p, ds, ccfg, tcfg)
    print(f"FINAL train {tr:.6f} valid {va:.6f} "
          f"test {test:.6f} epochs {len(hist['train_loss'])}")


if __name__ == "__main__":
    main()
