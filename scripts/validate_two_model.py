#!/usr/bin/env python
"""Two-model comparison figures with Cantera-truth overlays (C17/C18 parity).

Mirrors SURROGATE_MODEL/surrogate_model_Eoff_validation_plot.py: two trained
surrogates (different mechanisms) evaluated at the sweep's sorted-T quartile/
median/near-max conditions, 3x3 species grid, solid vs dashed per model, with
the Cantera-equivalent reference scattered alongside (:308-318). The reference
pairs LLNL vs NUIG for Eoff (:414) and JetSurf vs LLNL for Eon
(surrogate_model_Eon_validation_plot.py:18).

Usage:
  HEXPYRO_PLATFORM=cpu python scripts/validate_two_model.py [eoff|eon] [MECH_A] [MECH_B]
Defaults: eoff JetSurf NUIGMech1.1.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexpyro.pipeline import stages
from hexpyro.pipeline.config import PipelineConfig

ROOTS = {"JetSurf": "flagship", "NUIGMech1.1": "flagship_nuig", "LLNL": "flagship_llnl"}
TAGS = {"JetSurf": "JetSurf", "NUIGMech1.1": "NUIG", "LLNL": "LLNL"}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "eoff"
    mech_a = sys.argv[2] if len(sys.argv) > 2 else "JetSurf"
    mech_b = sys.argv[3] if len(sys.argv) > 3 else "NUIGMech1.1"
    energy_on = mode == "eon"
    eon = "_eon" if energy_on else ""
    m = "Eon" if energy_on else "Eoff"

    def root(mech):
        r = ROOTS[mech]
        # JetSurf eon root is runs/flagship_eon; others are runs/flagship_X_eon
        return f"runs/flagship{eon}" if mech == "JetSurf" and energy_on else f"runs/{r}{eon}"

    ra, rb = root(mech_a), root(mech_b)
    cfg = PipelineConfig(mechanism=mech_a, n_cases=800, out_root=ra,
                         energy_on=energy_on)
    kw = {}
    if energy_on:
        kw = dict(temp_mlp_dirs=(f"{ra}/temp_mlp", f"{rb}/temp_mlp"))
    fig = stages.stage_validate(
        cfg,
        crnn_npz_a=f"{ra}/crnn/training_history_{TAGS[mech_a]}_{m}.npz",
        crnn_npz_b=f"{rb}/crnn/training_history_{TAGS[mech_b]}_{m}.npz",
        time_mlp_dir_a=f"{ra}/time_mlp",
        time_mlp_dir_b=f"{rb}/time_mlp",
        mech_a=mech_a,
        mech_b=mech_b,
        dataset_dirs=(f"{ra}/datasets/2D_{'on' if energy_on else 'off'}",
                      f"{rb}/datasets/2D_{'on' if energy_on else 'off'}"),
        fig_path=f"{ra}/figures/two_model_{TAGS[mech_a]}_vs_{TAGS[mech_b]}_{m}.png",
        **kw,
    )
    print(fig)


if __name__ == "__main__":
    main()
