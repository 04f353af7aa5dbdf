#!/usr/bin/env python
"""Round-4 pipeline tasks, one subcommand each (driven by round4_coordinator.sh).

  benchds       TPU: JetSurf Eoff 2D sweep of flagship cases 1-64 (the train
                bench's real dataset), then copy into examples/bench_dataset/.
  eoff4d-sweep  TPU: LLNL Eoff 4D 400-case sweep (reference seed-13895 draw) --
                the truth set for the reference-exact C15 deploy
                (surrogate_model_Eoff_single_model.py:88,242-290) and the
                training set for the variable-geometry LLNL_4D_time_off MLP.
  eoff4d-mlp    CPU-ok: train that time-MLP (time_profile_model_training_4D.py
                equivalent, trained on 4D_off like the reference's).
  eoff4d-deploy CPU-ok: 400-case variable-geometry Eoff deployment + metric CSV.
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hexpyro.pipeline import artifacts, stages
from hexpyro.pipeline.config import PipelineConfig
from validation_container import REF_4D_CSV, mlp4d_cfg

REF_2D_CSV = ("/root/reference/CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/"
              "sampling_case_2D.csv")


def flagship_bench_cfg():
    """Flagship JetSurf Eoff config capped at the bench's 64 cases (cases 1-64
    of the reference's checked-in seed-2024 draw, so the regenerated files are
    interchangeable with the full 800-case flagship dataset)."""
    return PipelineConfig(
        mechanism="JetSurf", energy_on=False, dims=2, n_cases=64, seed=2024,
        out_root="runs/flagship", dtype="f32", chunk_size=16,
        window=int(os.environ.get("HEXPYRO_SWEEP_WINDOW", "25")),
    )


def benchds():
    cfg = flagship_bench_cfg()
    os.makedirs(cfg.out_root, exist_ok=True)
    if not os.path.exists(cfg.cases_csv):
        shutil.copy(REF_2D_CSV, cfg.cases_csv)
    stages.stage_simulate(cfg)
    dest = "examples/bench_dataset"
    os.makedirs(dest, exist_ok=True)
    for k in range(cfg.n_cases):
        fn = artifacts.trajectory_case_filename("JetSurf", False, k + 1)
        shutil.copy(os.path.join(cfg.dataset_dir, fn), os.path.join(dest, fn))
    print(f"[benchds] {cfg.n_cases} trajectories -> {dest}")


def eoff4d_sweep():
    cfg = mlp4d_cfg("LLNL", False)
    os.makedirs(cfg.out_root, exist_ok=True)
    if not os.path.exists(cfg.cases_csv):
        shutil.copy(REF_4D_CSV, cfg.cases_csv)
    stages.stage_simulate(cfg)


def eoff4d_mlp():
    stages.stage_train_profile_mlp(mlp4d_cfg("LLNL", False), "time")
    stages.stage_eval_mlp(mlp4d_cfg("LLNL", False), "time")


def eoff4d_deploy():
    """The reference-exact C15 configuration: Eoff single-model deployment on
    the 400-case variable-geometry 4D set with the 4D-trained time-MLP."""
    cfg = mlp4d_cfg("LLNL", False)
    crnn = "runs/flagship_llnl/crnn/training_history_LLNL_Eoff.npz"
    stages.stage_deploy(
        cfg, crnn, f"{cfg.out_root}/time_mlp",
        dataset_dir=cfg.dataset_dir, cases_csv=cfg.cases_csv, eval_tag="_4D",
    )


def main():
    task = sys.argv[1]
    {
        "benchds": benchds,
        "eoff4d-sweep": eoff4d_sweep,
        "eoff4d-mlp": eoff4d_mlp,
        "eoff4d-deploy": eoff4d_deploy,
    }[task]()


if __name__ == "__main__":
    main()
