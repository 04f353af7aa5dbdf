#!/usr/bin/env python
"""Warm-restart the LLNL Eon CRNN out of a plateau-LR collapse.

By epoch 170 the plateau cascade had decayed the LR to 5e-5 (scale ~0.010)
and descent flattened at train ~1.42e-3 (target: beat the reference's
1.208e-3, BASELINE.md). Classic remedy: finish with a LARGER batch instead of
an ever-smaller LR (lower gradient noise at equal step size). This resume
keeps the full optimizer state + history and switches to batch 8 with the
effective LR restored to ~2.4e-4 (the regime with the best recent descent
rate) by scaling the base LR against the replayed plateau factor.
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

from hexpyro.pipeline import artifacts
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.pipeline.stages import _dataset_paths
from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training import crnn_trainer as ct

ROOT = "runs/flagship_llnl_eon"
cfg = PipelineConfig(mechanism="LLNL", n_cases=800, out_root=ROOT, energy_on=True)
ds = ct.load_crnn_dataset(_dataset_paths(cfg))
params = artifacts.load_mlp_params_npz(f"{ROOT}/temp_mlp/weights_LLNL_2D.npz")
lo, hi = artifacts.load_minmax_scaler(f"{ROOT}/temp_mlp/min_max_LLNL_2D.pkl")
ds = ct.substitute_temp_profiles(ds, params, lo, hi)
ccfg = config_for("LLNL", energy_on=True)
save = f"{ROOT}/crnn/training_history_LLNL_Eon.npz"

# phase 2 (epoch ~220): temp_mlp swapped to the 600-epoch v2 MLP (mean |dT|
# 0.151 K vs 0.623 K; scripts/improve_temp_mlp.py), which moves the epoch-220
# checkpoint to train 1.291e-3 / valid 1.302e-3 on the new surface. The
# plateau cascade had collapsed the LR to 1.9e-5; resume_lr_scale restores the
# effective LR to 2e-4 (the best observed descent regime) and resets the
# plateau best so the controller re-adapts to the new surface.
# phase 4 (epoch ~400): AdamW flattened at train 1.246e-3 / valid 1.238e-3
# with the plateau LR collapsed to 9e-8. The right tool at the basin bottom
# is full-batch quasi-Newton: polish_crnn runs L-BFGS on the complete train
# split (one jitted 640-case value_and_grad per iteration on the chip),
# stopping as soon as both reference anchors are beaten.
TRAIN_TARGET, VALID_TARGET = 1.19e-3, 1.09e-3
tcfg = ct.CRNNTrainConfig(max_steps_per_interval=2, save_path=save)
import numpy as np  # noqa: E402

with np.load(save + ".state.npz") as z:
    p0 = np.asarray(z["p"])
scale = ct.adam_param_scale(save + ".state.npz")
p, tr, va, info = ct.polish_crnn(
    p0, ds, ccfg, tcfg, maxiter=250, eval_chunk=80,
    stop_train=TRAIN_TARGET, stop_valid=VALID_TARGET, save_path=save,
    param_scale=scale,
)
print(f"POLISH train {tr:.6e} valid {va:.6e} ({info['status']})", flush=True)

if not (tr <= TRAIN_TARGET and va <= VALID_TARGET):
    # fall back to SGD exploration from the polished point: batch 4 (2x the
    # steps/epoch of the stalled batch-8 phase) with the warm LR restored
    tcfg = ct.CRNNTrainConfig(
        epochs=600, batch_size=4, learning_rate=5e-3, plateau_patience=10,
        resume_lr_scale=0.048,
        max_steps_per_interval=2, save_path=save, save_every=10,
        stop_at_train_loss=TRAIN_TARGET, stop_at_valid_loss=VALID_TARGET,
    )
    p, hist = ct.train_crnn(init_parameters(0, ccfg), ds, ccfg, tcfg)
    # one more polish from wherever SGD ends (cheap if already at a basin)
    p, tr, va, info = ct.polish_crnn(
        np.asarray(p), ds, ccfg, tcfg, maxiter=250, eval_chunk=80,
        stop_train=TRAIN_TARGET, stop_valid=VALID_TARGET, save_path=save,
    )
    print(f"POLISH2 train {tr:.6e} valid {va:.6e} ({info['status']})", flush=True)

test = ct.test_crnn(p, ds, ccfg, tcfg)
print(f"FINAL train {tr:.6e} valid {va:.6e} test {test:.6e}")
