#!/usr/bin/env python
"""Restore the gitignored runs/ layout from the committed examples/ artifacts.

runs/ is working state (sweep datasets, checkpoints) and does not survive a
machine reset; everything a downstream stage needs to *reuse* a delivered
flagship (CRNN npz history, profile-MLP weights + min/max scalers) is however
checked in under examples/flagship_*. This script copies those back into the
runs/ paths the pipeline scripts expect (flagship_finish.py, flagship_train.py
resume, validation_container.py FLAGSHIP map), so figure/deploy stages run on
a fresh clone without re-training. Sweep datasets are NOT restorable — they
are regenerated deterministically from their LHS seeds (stage_simulate skips
existing chunks, so partial regeneration composes with this).

Idempotent; existing files are left in place unless --force.
"""

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (example dir, [(src file, runs-relative dest), ...])
MAP = {
    "examples/flagship_jetsurf_800": [
        ("training_history_JetSurf_Eoff.npz", "runs/flagship/crnn/"),
        ("weights_JetSurf_4D_time_off.npz", "runs/flagship/time_mlp/"),
        ("min_max_JetSurf_4D_time_off.pkl", "runs/flagship/time_mlp/"),
    ],
    "examples/flagship_jetsurf_800_eon": [
        ("training_history_JetSurf_Eon.npz", "runs/flagship_eon/crnn/"),
        ("weights_JetSurf_2D.npz", "runs/flagship_eon/temp_mlp/"),
        ("min_max_JetSurf_2D.pkl", "runs/flagship_eon/temp_mlp/"),
        ("weights_JetSurf_4D_time_on.npz", "runs/flagship_eon/time_mlp/"),
        ("min_max_JetSurf_4D_time_on.pkl", "runs/flagship_eon/time_mlp/"),
    ],
    "examples/flagship_jetsurf_4d": [
        # variable-geometry (seed-13895 4D sweep) time-MLP — distinct from the
        # fixed-geometry one in flagship_jetsurf_800_eon
        ("weights_JetSurf_4D_time_on.npz", "runs/flagship_4d/time_mlp/"),
        ("min_max_JetSurf_4D_time_on.pkl", "runs/flagship_4d/time_mlp/"),
    ],
    "examples/flagship_llnl_800": [
        ("training_history_LLNL_Eoff.npz", "runs/flagship_llnl/crnn/"),
        ("weights_LLNL_4D_time_off.npz", "runs/flagship_llnl/time_mlp/"),
        ("min_max_LLNL_4D_time_off.pkl", "runs/flagship_llnl/time_mlp/"),
    ],
    "examples/flagship_llnl_800_eon": [
        ("training_history_LLNL_Eon.npz", "runs/flagship_llnl_eon/crnn/"),
        ("weights_LLNL_2D.npz", "runs/flagship_llnl_eon/temp_mlp/"),
        ("min_max_LLNL_2D.pkl", "runs/flagship_llnl_eon/temp_mlp/"),
        ("weights_LLNL_4D_time_on.npz", "runs/flagship_llnl_eon/time_mlp/"),
        ("min_max_LLNL_4D_time_on.pkl", "runs/flagship_llnl_eon/time_mlp/"),
    ],
    "examples/flagship_llnl_wide": [
        ("training_history_LLNL_Eoff_wide.npz", "runs/flagship_llnl_wide/crnn/"),
    ],
    "examples/flagship_nuig_800": [
        ("training_history_NUIG_Eoff.npz", "runs/flagship_nuig/crnn/"),
        ("weights_NUIGMech1.1_4D_time_off.npz", "runs/flagship_nuig/time_mlp/"),
        ("min_max_NUIGMech1.1_4D_time_off.pkl", "runs/flagship_nuig/time_mlp/"),
    ],
    "examples/flagship_nuig_800_eon": [
        ("training_history_NUIG_Eon.npz", "runs/flagship_nuig_eon/crnn/"),
        ("weights_NUIGMech1.1_2D.npz", "runs/flagship_nuig_eon/temp_mlp/"),
        ("min_max_NUIGMech1.1_2D.pkl", "runs/flagship_nuig_eon/temp_mlp/"),
        ("weights_NUIGMech1.1_4D_time_on.npz", "runs/flagship_nuig_eon/time_mlp/"),
        ("min_max_NUIGMech1.1_4D_time_on.pkl", "runs/flagship_nuig_eon/time_mlp/"),
    ],
    "examples/flagship_llnl_4d_eoff": [
        # reference-exact C15: LLNL Eoff variable-geometry (seed-13895 4D
        # sweep) time-MLP (round-4 delivery)
        ("weights_LLNL_4D_time_off.npz", "runs/mlp4d_llnl_off/time_mlp/"),
        ("min_max_LLNL_4D_time_off.pkl", "runs/mlp4d_llnl_off/time_mlp/"),
    ],
    "examples/validation_4d_container": [
        ("sampling_case_4D.csv", "runs/validation_4d/"),
        # LLNL Eon variable-geometry (seed-13895 4D sweep) time-MLP — the
        # C18 container deploy's second model (round-4 delivery)
        ("time_mlp/weights_LLNL_4D_time_on.npz", "runs/mlp4d_llnl_on/time_mlp/"),
        ("time_mlp/min_max_LLNL_4D_time_on.pkl", "runs/mlp4d_llnl_on/time_mlp/"),
    ],
}


def main():
    force = "--force" in sys.argv
    restored = skipped = missing = 0
    for exdir, entries in MAP.items():
        for fname, dest_rel in entries:
            src = os.path.join(REPO, exdir, fname)
            dest_dir = os.path.join(REPO, dest_rel)
            dest = os.path.join(dest_dir, os.path.basename(fname))
            if not os.path.exists(src):
                missing += 1
                continue
            if os.path.exists(dest) and not force:
                skipped += 1
                continue
            os.makedirs(dest_dir, exist_ok=True)
            shutil.copy(src, dest)
            restored += 1
    print(f"[rehydrate] restored {restored}, kept {skipped}, "
          f"not-yet-delivered {missing}")


if __name__ == "__main__":
    main()
