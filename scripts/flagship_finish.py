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
    mode = sys.argv[1] if len(sys.argv) > 1 else "eoff"
    mech = sys.argv[2] if len(sys.argv) > 2 else "JetSurf"
    mech_tag = "NUIG" if mech.startswith("NUIG") else mech
    energy_on = mode == "eon"
    suffix = {"JetSurf": "", "NUIGMech1.1": "_nuig", "LLNL": "_llnl"}[mech]
    eon_tag = "_eon" if energy_on else ""
    root = f"runs/flagship{eon_tag}{suffix}" \
        if mech == "JetSurf" else f"runs/flagship{suffix}{eon_tag}"
    indep = f"runs/independent{eon_tag}{suffix}" \
        if mech == "JetSurf" else f"runs/independent{suffix}{eon_tag}"
    cfg = PipelineConfig(mechanism=mech, n_cases=800, out_root=root,
                         energy_on=energy_on)
    m = "Eon" if energy_on else "Eoff"
    npz = f"{root}/crnn/training_history_{mech_tag}_{m}.npz"
    time_dir = f"{root}/time_mlp"
    temp_dir = f"{root}/temp_mlp" if energy_on else None

    tr, va = artifacts.load_crnn_history_losses(npz)
    print(f"CRNN epochs={len(tr)} final train={tr[-1]:.6f} valid={va[-1]:.6f}")

    # 1. deploy on the training sweep (the reference's own-data evaluation)
    train_csv = stages.stage_deploy(cfg, npz, time_dir, temp_mlp_dir=temp_dir)

    # 2. deploy on the independent sweep (held-out LHS, seed 12984)
    indep_csv = stages.stage_deploy(
        cfg, npz, time_dir, temp_mlp_dir=temp_dir,
        dataset_dir=f"{indep}/datasets/2D_{'on' if energy_on else 'off'}",
        cases=np.loadtxt(f"{indep}/sampling_case_2D.csv", delimiter=",")[:400],
        eval_tag="_independent",
    )

    # 3. profile-MLP eval figures
    stages.stage_eval_mlp(cfg, "time")
    if energy_on:
        stages.stage_eval_mlp(cfg, "temp")

    # 4. package into examples/
    ex = f"examples/flagship_{mech_tag.lower()}_800{'_eon' if energy_on else ''}"
    os.makedirs(ex, exist_ok=True)
    os.makedirs(f"{ex}/figures", exist_ok=True)
    shutil.copy(npz, ex)
    ttag = f"{mech}_4D_time_{'on' if energy_on else 'off'}"
    shutil.copy(f"{time_dir}/weights_{ttag}.npz", ex)
    shutil.copy(f"{time_dir}/min_max_{ttag}.pkl", ex)
    if energy_on:
        shutil.copy(f"{temp_dir}/weights_{mech}_2D.npz", ex)
        shutil.copy(f"{temp_dir}/min_max_{mech}_2D.pkl", ex)
    shutil.copy(train_csv, f"{ex}/metrics_{mech_tag}_{m}_train.csv")
    shutil.copy(indep_csv, f"{ex}/metrics_{mech_tag}_{m}_independent.csv")
    for f in os.listdir(f"{root}/figures"):
        shutil.copy(f"{root}/figures/{f}", f"{ex}/figures/{f}")
    # a handful of prediction txts as samples (full sets stay in runs/)
    pred_dir = f"{root}/predictions_{mech_tag}_{m}_independent"
    os.makedirs(f"{ex}/sample_predictions", exist_ok=True)
    for k in (1, 100, 200, 400):
        p = f"{pred_dir}/pred_{mech_tag}{'on' if energy_on else 'off'}_{k}.txt"
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
