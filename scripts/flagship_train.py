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

from hexpyro.pipeline import artifacts
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.pipeline.stages import _dataset_paths
from hexpyro.surrogate import mlp as mlp_mod
from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training import crnn_trainer as ct


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "eoff"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    energy_on = mode == "eon"
    out_root = "runs/flagship_eon" if energy_on else "runs/flagship"
    cfg = PipelineConfig(
        mechanism="JetSurf", n_cases=800, out_root=out_root, energy_on=energy_on
    )
    ds = ct.load_crnn_dataset(_dataset_paths(cfg))
    if energy_on:
        # Eon recipe: substitute the measured T(t) by the temp-MLP prediction
        # (Eon_surrogate_model_training.py:118-195)
        mlp_dir = f"{out_root}/temp_mlp"
        params = artifacts.load_mlp_params_npz(f"{mlp_dir}/weights_JetSurf_2D.npz")
        lo, hi = artifacts.load_minmax_scaler(f"{mlp_dir}/min_max_JetSurf_2D.pkl")
        ds = ct.substitute_temp_profiles(ds, params, lo, hi)
    ccfg = config_for("JetSurf", energy_on=energy_on)
    save = f"{out_root}/crnn/training_history_JetSurf_{'Eon' if energy_on else 'Eoff'}.npz"
    target = 2.9e-3 if energy_on else 5.4e-3  # just under the reference's loss
    tcfg = ct.CRNNTrainConfig(
        epochs=epochs,
        batch_size=int(os.environ.get("HEXPYRO_FLAGSHIP_BATCH", "8")),
        max_steps_per_interval=2,
        save_path=save,
        save_every=10,
        stop_at_train_loss=target,
    )
    p_resume, done = ct.resume_parameters(save)
    p0 = p_resume if p_resume is not None else init_parameters(0, ccfg)
    if p_resume is not None:
        print(f"resuming from {save} ({done} epochs recorded)")
    p, hist = ct.train_crnn(p0, ds, ccfg, tcfg)
    test = ct.test_crnn(p, ds, ccfg, tcfg)
    print(f"FINAL train {hist['train_loss'][-1]:.6f} valid {hist['valid_loss'][-1]:.6f} "
          f"test {test:.6f} epochs {len(hist['train_loss'])}")


if __name__ == "__main__":
    main()
