#!/usr/bin/env python
"""NUIG Eon flagship pipeline: the reference's deepest remaining baseline.

Reference anchor (BASELINE.md): NUIG Eon train/valid MSE 1.695e-3/1.649e-3 in
300 epochs (SURROGATE_MODEL_PARAMETER_CONTAINER/training_history_NUIG_Eon.npz).

Stages (each skipped if its artifacts exist):
  python scripts/flagship_nuig_eon.py sweep   # TPU: 800-case adiabatic sweep
  python scripts/flagship_nuig_eon.py indep   # TPU: 400-case independent sweep
  python scripts/flagship_nuig_eon.py mlp     # CPU ok: temp + time MLPs
  (CRNN training then runs via scripts/flagship_train.py eon 600 NUIGMech1.1;
   packaging via scripts/flagship_finish.py eon NUIGMech1.1)
"""

import dataclasses
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexpyro.pipeline import stages
from hexpyro.pipeline.config import PipelineConfig

ROOT = "runs/flagship_nuig_eon"
INDEP = "runs/independent_nuig_eon"


def make_cfg(out_root=ROOT, n_cases=800, seed=2024):
    return PipelineConfig(
        mechanism="NUIGMech1.1", energy_on=True, n_cases=n_cases, seed=seed,
        out_root=out_root, dtype="f32", chunk_size=int(os.environ.get("HEXPYRO_SWEEP_CHUNK", "16")), window=25,
    )


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = make_cfg()
    os.makedirs(ROOT, exist_ok=True)
    # training sweep reuses the flagship 2D LHS draw (seed 2024), same as the
    # other flagship runs (reference training CSV reproduction); the draw is
    # deterministic, so regenerate it if the sibling run's copy is gone
    if not os.path.exists(cfg.cases_csv):
        src = "runs/flagship_llnl_eon/sampling_case_2D.csv"
        if os.path.exists(src):
            shutil.copy(src, cfg.cases_csv)
        else:
            stages.stage_sample(cfg)

    if step in ("sweep", "all"):
        stages.stage_simulate(cfg)
    if step in ("indep", "all"):
        icfg = make_cfg(out_root=INDEP, n_cases=400, seed=12984)
        os.makedirs(INDEP, exist_ok=True)
        if not os.path.exists(icfg.cases_csv):
            src = "runs/independent_llnl_eon/sampling_case_2D.csv"
            if os.path.exists(src):
                shutil.copy(src, icfg.cases_csv)
            else:
                stages.stage_sample(icfg)
        stages.stage_simulate(icfg)
    if step in ("mlp", "all"):
        # temp-MLP: 600 epochs instead of the reference's 20 — the Eon CRNN
        # trains against the SUBSTITUTED MLP profiles, so temp-MLP error is an
        # irreducible CRNN loss floor (measured on LLNL: 1.4e-4 of valid loss
        # at 20 epochs; scripts/improve_temp_mlp.py)
        stages.stage_train_profile_mlp(
            dataclasses.replace(cfg, epochs=600), "temp")
        stages.stage_train_profile_mlp(cfg, "time")


if __name__ == "__main__":
    main()
