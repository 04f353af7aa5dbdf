#!/usr/bin/env python
"""4D (T, P, L, u0) Eon flagship: the reference's variable-geometry flow.

Reproduces the INDEPENDENT_DATASET_GENERATION 4D pipeline (C7/C12/C16):
the reference's checked-in 400-case 4D LHS (seed 13895, L in [0.5, 1.0] m,
u0 in [2.5, 5.0] m/s; INDEPENDENT_DATASET_GENERATION/Latin_hypercube_sampling_4D.py:22-34)
is swept adiabatically with per-case geometry and a density column
(simul_data_gene_fix_chain_4D.py:231-233), a 4-input time-grid MLP is trained
on the real variable-geometry residence-time grids
(TIME_PRED_MODEL_TRAINING/time_profile_model_training_4D.py:38-47), and the
flagship JetSurf Eon surrogate (temp-MLP + Eon CRNN from runs/flagship_eon) is
deployed with the per-case trim at the predicted end time
(surrogate_model_Eon_single_model.py:338-368).

Stages (each skipped if its artifact exists):
  python scripts/flagship_4d.py sweep    # TPU: 400-case 4D Eon JetSurf sweep
  python scripts/flagship_4d.py mlp      # time-MLP on the true 4D grids
  python scripts/flagship_4d.py deploy   # Eon trim deploy + metrics (CPU ok)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hexpyro.pipeline import stages
from hexpyro.pipeline.config import PipelineConfig

ROOT = "runs/flagship_4d"
REF_CSV = "/root/reference/INDEPENDENT_DATASET_GENERATION/sampling_case_4D.csv"


def make_cfg():
    return PipelineConfig(
        mechanism="JetSurf", energy_on=True, dims=4, n_cases=400,
        seed=13895, out_root=ROOT, dtype="f32", chunk_size=16, window=100,
    )


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = make_cfg()
    os.makedirs(ROOT, exist_ok=True)
    if not os.path.exists(cfg.cases_csv):
        shutil.copy(REF_CSV, cfg.cases_csv)

    if step in ("sweep", "all"):
        stages.stage_simulate(cfg)
    if step in ("mlp", "all"):
        stages.stage_train_profile_mlp(cfg, "time")
    if step in ("deploy", "all"):
        import pandas as pd

        csv = stages.stage_deploy(
            cfg,
            crnn_npz="runs/flagship_eon/crnn/training_history_JetSurf_Eon.npz",
            time_mlp_dir=f"{ROOT}/time_mlp",
            temp_mlp_dir="runs/flagship_eon/temp_mlp",
        )
        df = pd.read_csv(csv)
        print(f"[4D deploy] median NRMSE_time_avg={df['NRMSE_time_avg'].median():.4f} "
              f"median RelError_time_avg={df['RelError_time_avg(%)'].median():.2f}%")
        ex = "examples/flagship_jetsurf_4d"
        os.makedirs(ex, exist_ok=True)
        shutil.copy(csv, f"{ex}/metrics_JetSurf_Eon_4D.csv")
        for f in ("weights_JetSurf_4D_time_on.npz", "min_max_JetSurf_4D_time_on.pkl"):
            shutil.copy(f"{ROOT}/time_mlp/{f}", ex)


if __name__ == "__main__":
    main()
