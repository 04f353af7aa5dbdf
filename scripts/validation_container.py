#!/usr/bin/env python
"""Self-generated 810-case 4D validation container + C17/C18 two-model figures.

The reference's C17/C18 validation plots run on VALIDATION_DATASET_CONTAINER/
4D_valid: 810 held-out 4D cases with a per-case geometry sidecar
reactor_geometry.txt (surrogate_model_Eoff_validation_plot.py:414-426,
surrogate_model_Eon_validation_plot.py:259,301,338). That data is absent from
the reference repo, so this script reproduces the FLOW end to end:

  1. an 810-case 4D LHS validation draw (held-out seed 20817; the reference's
     own draw/seed is not checked in),
  2. Cantera-equivalent sweeps of the container for both figure pairings --
     LLNL vs NUIG Eoff (Eoff_validation_plot.py:414,502) and JetSurf vs LLNL
     Eon (Eon_validation_plot.py:261,301) -- all txts + reactor_geometry.txt
     in ONE shared 4D_valid directory like the reference's,
  3. 400-case 4D sweeps (the reference's checked-in seed-13895 draw) to train
     the per-mechanism 4-input time-grid MLPs the validation deploys need
     (TIME_PRED_MODEL_TRAINING/time_profile_model_training_4D.py),
  4. stage_validate(picker="reference-valid", geometry_txt=...) for both
     pairings: Eoff picks from the seed-42 test split sorted by T
     (:569-573,367-373), Eon picks sorted-all 200/410/800 (:566-570).

Stages (idempotent; artifacts skipped if present):
  python scripts/validation_container.py sweep     # TPU: container sweeps
  python scripts/validation_container.py mlp4d     # TPU sweep + CPU-ok MLPs
  python scripts/validation_container.py figures   # CPU ok
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hexpyro.pipeline import artifacts, stages
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.sampling import lhs

ROOT = "runs/validation_4d"
CONTAINER = f"{ROOT}/4D_valid"
N_VALID = 810
VALID_SEED = 20817
REF_4D_CSV = "/root/reference/INDEPENDENT_DATASET_GENERATION/sampling_case_4D.csv"

# (mechanism, energy_on) sweeps the two reference figure pairings need
PAIRINGS = {
    "eoff": ("LLNL", "NUIGMech1.1"),
    "eon": ("JetSurf", "LLNL"),
}
FLAGSHIP = {
    ("LLNL", False): "runs/flagship_llnl",
    ("NUIGMech1.1", False): "runs/flagship_nuig",
    ("JetSurf", True): "runs/flagship_eon",
    ("LLNL", True): "runs/flagship_llnl_eon",
}


def container_cfg(mech, energy_on):
    return PipelineConfig(
        mechanism=mech, energy_on=energy_on, dims=4, n_cases=N_VALID,
        seed=VALID_SEED, out_root=ROOT, dataset_dir_override=CONTAINER,
        dtype="f32", chunk_size=int(os.environ.get("HEXPYRO_SWEEP_CHUNK", "16")), window=25,
    )


def mlp4d_root(mech, energy_on):
    return f"runs/mlp4d_{'NUIG' if mech.startswith('NUIG') else mech.lower()}" \
           f"_{'on' if energy_on else 'off'}"


def mlp4d_cfg(mech, energy_on):
    return PipelineConfig(
        mechanism=mech, energy_on=energy_on, dims=4, n_cases=400, seed=13895,
        out_root=mlp4d_root(mech, energy_on), dtype="f32", chunk_size=int(os.environ.get("HEXPYRO_SWEEP_CHUNK", "16")),
        # window=100 deterministically faults the TPU on LLNL Eon 4D (three
        # identical UNAVAILABLE kernel faults ~95 s in); 25 matches the
        # container cfg, which swept the same mechanism/mode cleanly.
        window=int(os.environ.get("HEXPYRO_SWEEP_WINDOW", "25")),
    )


def ensure_draw():
    os.makedirs(CONTAINER, exist_ok=True)
    csv = f"{ROOT}/sampling_case_4D.csv"
    if not os.path.exists(csv):
        cases = lhs.sample_4d(N_VALID, seed=VALID_SEED)
        lhs.write_cases_csv(csv, cases)
    cases = lhs.read_cases_csv(csv)
    geom = f"{CONTAINER}/reactor_geometry.txt"
    if not os.path.exists(geom):
        # two columns (L, u0), one row per case (reference :426-429)
        np.savetxt(geom, cases[:, 2:4])
    return csv


def existing_time_mlp(mech, energy_on):
    """Variable-geometry 4D time-MLP dir if one was already trained.

    Searches working runs/ first, then the committed examples/ deliveries
    (rehydrate_runs.py restores the same files), so the MLP is never
    retrained from scratch on a fresh clone.
    """
    tag = f"{mech}_4D_time_{'on' if energy_on else 'off'}"
    for root in (
        "runs/flagship_4d/time_mlp",
        f"{mlp4d_root(mech, energy_on)}/time_mlp",
        "examples/flagship_jetsurf_4d",
        "examples/validation_4d_container/time_mlp",
    ):
        if os.path.exists(f"{root}/weights_{tag}.npz"):
            return root
    return None


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "all"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"  # eoff | eon | both
    modes = ["eoff", "eon"] if which == "both" else [which]
    ensure_draw()

    if step in ("sweep", "all"):
        for mode in modes:
            for mech in PAIRINGS[mode]:
                stages.stage_simulate(container_cfg(mech, mode == "eon"))

    # mlp4d-sweeps: the TPU part only (400-case 4D sweeps); mlp4d-train: the
    # CPU part only (time-MLP fits) -- split so the chip is released while
    # the MLPs train on host. Plain mlp4d still does both serially.
    if step in ("mlp4d", "mlp4d-sweeps", "all"):
        for mode in modes:
            for mech in PAIRINGS[mode]:
                if existing_time_mlp(mech, mode == "eon"):
                    continue
                cfg = mlp4d_cfg(mech, mode == "eon")
                os.makedirs(cfg.out_root, exist_ok=True)
                if not os.path.exists(cfg.cases_csv):
                    shutil.copy(REF_4D_CSV, cfg.cases_csv)
                stages.stage_simulate(cfg)
                if step != "mlp4d-sweeps":
                    stages.stage_train_profile_mlp(cfg, "time")
    if step == "mlp4d-train":
        for mode in modes:
            for mech in PAIRINGS[mode]:
                if existing_time_mlp(mech, mode == "eon"):
                    continue
                stages.stage_train_profile_mlp(mlp4d_cfg(mech, mode == "eon"), "time")

    if step in ("figures", "all"):
        for mode in modes:
            energy_on = mode == "eon"
            mech_a, mech_b = PAIRINGS[mode]
            tag_a = "NUIG" if mech_a.startswith("NUIG") else mech_a
            tag_b = "NUIG" if mech_b.startswith("NUIG") else mech_b
            npz = {
                m: f"{FLAGSHIP[(m, energy_on)]}/crnn/training_history_"
                   f"{'NUIG' if m.startswith('NUIG') else m}_"
                   f"{'Eon' if energy_on else 'Eoff'}.npz"
                for m in (mech_a, mech_b)
            }
            cfg = container_cfg(mech_a, energy_on)
            fig = stages.stage_validate(
                cfg, npz[mech_a], npz[mech_b],
                existing_time_mlp(mech_a, energy_on),
                existing_time_mlp(mech_b, energy_on),
                mech_a, mech_b,
                temp_mlp_dirs=(
                    f"{FLAGSHIP[(mech_a, True)]}/temp_mlp" if energy_on else None,
                    f"{FLAGSHIP[(mech_b, True)]}/temp_mlp" if energy_on else None,
                ),
                dataset_dirs=(CONTAINER, CONTAINER),
                geometry_txt=f"{CONTAINER}/reactor_geometry.txt",
                picker="reference-valid",
                fig_path=f"{ROOT}/figures/two_model_{tag_a}_vs_{tag_b}_"
                         f"{'Eon' if energy_on else 'Eoff'}_4Dvalid.png",
            )
            print(f"[validation-container] {mode}: {fig}")


if __name__ == "__main__":
    main()
