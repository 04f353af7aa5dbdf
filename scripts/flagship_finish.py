#!/usr/bin/env python
"""Post-training packaging of the flagship JetSurf Eoff surrogate.

Run after runs/flagship CRNN training completes:
  HEXPYRO_PLATFORM=cpu python scripts/flagship_finish.py

Deploys the trained surrogate on the TRAINING sweep and on the INDEPENDENT
400-case sweep (different LHS seed, reference
INDEPENDENT_DATASET_GENERATION/Latin_hypercube_sampling_2D.py:32 seed 12984),
writes per-case prediction txts + metric CSVs, renders MLP-eval figures, and
copies the checked-in artifacts to examples/flagship_jetsurf_800/.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hexpyro.pipeline import artifacts, stages
from hexpyro.pipeline.config import PipelineConfig


def main():
    cfg = PipelineConfig(mechanism="JetSurf", n_cases=800, out_root="runs/flagship")
    npz = f"{cfg.out_root}/crnn/training_history_JetSurf_Eoff.npz"
    time_dir = f"{cfg.out_root}/time_mlp"

    tr, va = artifacts.load_crnn_history_losses(npz)
    print(f"CRNN epochs={len(tr)} final train={tr[-1]:.6f} valid={va[-1]:.6f}")

    # 1. deploy on the training sweep (the reference's own-data evaluation)
    train_csv = stages.stage_deploy(cfg, npz, time_dir)

    # 2. deploy on the independent sweep (held-out LHS, seed 12984)
    indep_csv = stages.stage_deploy(
        cfg, npz, time_dir,
        dataset_dir="runs/independent/datasets/2D_off",
        cases=np.loadtxt("runs/independent/sampling_case_2D.csv", delimiter=",")[:400],
        eval_tag="_independent",
    )

    # 3. time-MLP eval figures
    stages.stage_eval_mlp(cfg, "time")

    # 4. package into examples/
    ex = "examples/flagship_jetsurf_800"
    os.makedirs(ex, exist_ok=True)
    os.makedirs(f"{ex}/figures", exist_ok=True)
    shutil.copy(npz, ex)
    shutil.copy(f"{time_dir}/weights_JetSurf_4D_time_off.npz", ex)
    shutil.copy(f"{time_dir}/min_max_JetSurf_4D_time_off.pkl", ex)
    shutil.copy(train_csv, f"{ex}/metrics_JetSurf_Eoff_train.csv")
    shutil.copy(indep_csv, f"{ex}/metrics_JetSurf_Eoff_independent.csv")
    for f in os.listdir(f"{cfg.out_root}/figures"):
        shutil.copy(f"{cfg.out_root}/figures/{f}", f"{ex}/figures/{f}")
    # a handful of prediction txts as samples (full sets stay in runs/)
    pred_dir = f"{cfg.out_root}/predictions_JetSurf_Eoff_independent"
    os.makedirs(f"{ex}/sample_predictions", exist_ok=True)
    for k in (1, 100, 200, 400):
        p = f"{pred_dir}/pred_JetSurfoff_{k}.txt"
        if os.path.exists(p):
            shutil.copy(p, f"{ex}/sample_predictions/")
    # metric summary
    import pandas as pd

    for name, csv in (("train", train_csv), ("independent", indep_csv)):
        df = pd.read_csv(csv)
        print(f"[{name}] median NRMSE_time_avg={df['NRMSE_time_avg'].median():.4f} "
              f"median RelError_time_avg={df['RelError_time_avg(%)'].median():.2f}% "
              f"mean FCD={df['FCD'].mean():.4g}")
    print(f"packaged -> {ex}")


if __name__ == "__main__":
    main()
