#!/usr/bin/env python
"""Two-model comparison figures with Cantera-truth overlays (C17/C18 parity).

Mirrors SURROGATE_MODEL/surrogate_model_Eoff_validation_plot.py: two trained
surrogates (different mechanisms) evaluated at the sweep's sorted-T quartile/
median/near-max conditions, 3x3 species grid, solid vs dashed per model, with
the Cantera-equivalent reference scattered alongside (:308-318).

Usage: HEXPYRO_PLATFORM=cpu python scripts/validate_two_model.py [eoff|eon]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexpyro.pipeline import stages
from hexpyro.pipeline.config import PipelineConfig


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "eoff"
    energy_on = mode == "eon"
    if energy_on:
        raise SystemExit("eon two-model needs a second Eon-trained mechanism")
    cfg = PipelineConfig(mechanism="JetSurf", n_cases=800, out_root="runs/flagship")
    fig = stages.stage_validate(
        cfg,
        crnn_npz_a="runs/flagship/crnn/training_history_JetSurf_Eoff.npz",
        crnn_npz_b="runs/flagship_nuig/crnn/training_history_NUIG_Eoff.npz",
        time_mlp_dir_a="runs/flagship/time_mlp",
        time_mlp_dir_b="runs/flagship_nuig/time_mlp",
        mech_a="JetSurf",
        mech_b="NUIGMech1.1",
        dataset_dirs=("runs/flagship/datasets/2D_off",
                      "runs/flagship_nuig/datasets/2D_off"),
        fig_path="runs/flagship/figures/two_model_JetSurf_vs_NUIG_Eoff.png",
    )
    print(fig)


if __name__ == "__main__":
    main()
