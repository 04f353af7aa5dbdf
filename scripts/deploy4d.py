#!/usr/bin/env python
"""Reference-exact 4D variable-geometry deployment for any mechanism x mode.

The reference's deployment scripts run any mechanism by comment-toggle
(SURROGATE_MODEL/surrogate_model_Eoff_single_model.py:57-100) on the 4D
independent container (Latin_hypercube_sampling_4D.py seed 13895: 400 cases,
T, P, L in [0.5, 1.0] m, u0 in [2.5, 5.0] m/s). This script is the generic
hexpyro equivalent (supersedes the per-round flagship_4d.py/round4_tasks.py
one-shots): per (mechanism, mode) it

  sweep    TPU: 400-case 4D sweep with per-case geometry + density column
           (simul_data_gene_fix_chain_4D.py:231-233) -- the metric truth set
           and the time-MLP training set
  mlp      CPU-ok: 4-input (T0, P0, L, u0) time-grid MLP on the true
           variable-geometry residence-time grids
           (time_profile_model_training_4D.py:38-47); skipped when a
           variable-geometry MLP for this combo is already committed
  deploy   CPU-ok: flagship CRNN (+ temp-MLP for Eon) deployed on all 400
           cases -- Eoff direct, Eon dict+trim
           (surrogate_model_Eon_single_model.py:293-368) -- with the
           reference's nearest-time-resampled metric CSV (:384-480)
  package  copy metrics CSV + MLP weights into examples/

Usage: python scripts/deploy4d.py <LLNL|JetSurf|NUIGMech1.1> <on|off> [step]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hexpyro.pipeline import stages
from validation_container import REF_4D_CSV, mlp4d_cfg

# committed flagship artifacts (fresh-clone safe: read from examples/ directly)
CRNN_NPZ = {
    ("JetSurf", False): "examples/flagship_jetsurf_800/training_history_JetSurf_Eoff.npz",
    ("LLNL", False): "examples/flagship_llnl_800/training_history_LLNL_Eoff.npz",
    ("NUIGMech1.1", False): "examples/flagship_nuig_800/training_history_NUIG_Eoff.npz",
    ("JetSurf", True): "examples/flagship_jetsurf_800_eon/training_history_JetSurf_Eon.npz",
    ("LLNL", True): "examples/flagship_llnl_800_eon/training_history_LLNL_Eon.npz",
    ("NUIGMech1.1", True): "examples/flagship_nuig_800_eon/training_history_NUIG_Eon.npz",
}
TEMP_MLP_DIR = {  # Eon only: flagship temp-MLP (weights_{mech}_2D.npz)
    "JetSurf": "examples/flagship_jetsurf_800_eon",
    "LLNL": "examples/flagship_llnl_800_eon",
    "NUIGMech1.1": "examples/flagship_nuig_800_eon",
}
# committed VARIABLE-GEOMETRY time-MLPs (trained on a seed-13895 4D sweep).
# NB: the flagship_*_800* dirs also hold *_4D_time_* files, but those were
# trained on the 2D sweep at FIXED geometry (stage_train_profile_mlp dims=2
# branch) and must not be used here.
COMMITTED_4D_MLP = {
    ("JetSurf", True): "examples/flagship_jetsurf_4d",
    ("LLNL", False): "examples/flagship_llnl_4d_eoff",
    ("LLNL", True): "examples/validation_4d_container/time_mlp",
}


def example_dir(mech, energy_on):
    tag = "nuig" if mech.startswith("NUIG") else mech.lower()
    return f"examples/flagship_{tag}_4d_{'eon' if energy_on else 'eoff'}"


def time_mlp_dir(mech, energy_on):
    """Variable-geometry time-MLP location: committed delivery, else the
    local mlp4d training output (train via the `mlp` step)."""
    com = COMMITTED_4D_MLP.get((mech, energy_on))
    tag = f"{mech}_4D_time_{'on' if energy_on else 'off'}"
    if com and os.path.exists(f"{com}/weights_{tag}.npz"):
        return com
    loc = f"{mlp4d_cfg(mech, energy_on).out_root}/time_mlp"
    return loc if os.path.exists(f"{loc}/weights_{tag}.npz") else None


def main():
    mech = sys.argv[1]
    energy_on = sys.argv[2] == "on"
    step = sys.argv[3] if len(sys.argv) > 3 else "all"
    cfg = mlp4d_cfg(mech, energy_on)
    os.makedirs(cfg.out_root, exist_ok=True)
    if not os.path.exists(cfg.cases_csv):
        shutil.copy(REF_4D_CSV, cfg.cases_csv)

    if step in ("sweep", "all"):
        stages.stage_simulate(cfg)
    if step in ("mlp", "all") and time_mlp_dir(mech, energy_on) is None:
        stages.stage_train_profile_mlp(cfg, "time")
        stages.stage_eval_mlp(cfg, "time")
    if step in ("deploy", "all"):
        import pandas as pd

        csv = stages.stage_deploy(
            cfg, CRNN_NPZ[(mech, energy_on)], time_mlp_dir(mech, energy_on),
            temp_mlp_dir=TEMP_MLP_DIR[mech] if energy_on else None,
            eval_tag="_4D",
        )
        df = pd.read_csv(csv)
        print(f"[deploy4d {mech} {cfg.mode}] median NRMSE_time_avg="
              f"{df['NRMSE_time_avg'].median():.4f} median RelError_time_avg="
              f"{df['RelError_time_avg(%)'].median():.2f}%")
    if step in ("package", "all"):
        mech_tag = "NUIG" if mech.startswith("NUIG") else mech
        ex = example_dir(mech, energy_on)
        os.makedirs(ex, exist_ok=True)
        shutil.copy(f"{cfg.out_root}/metrics_{mech_tag}_{cfg.mode}_4D.csv", ex)
        src = time_mlp_dir(mech, energy_on)
        tag = f"{mech}_4D_time_{'on' if energy_on else 'off'}"
        if src and not src.startswith("examples/"):
            for f in (f"weights_{tag}.npz", f"min_max_{tag}.pkl"):
                shutil.copy(f"{src}/{f}", ex)
        print(f"[deploy4d] packaged -> {ex}")


if __name__ == "__main__":
    main()
