#!/usr/bin/env python
"""Priority-sweep the validation-container cases the C17/C18 figures need.

The reference's two-model validation plots read truth trajectories for just
three picked conditions out of the 810-case 4D_valid container
(surrogate_model_Eoff_validation_plot.py:569-573, Eon_validation_plot.py:
566-570). Filling the whole container is hours of TPU; the figures only need
those picks. This script computes the picked indices with the same picker
stage_validate uses and sweeps exactly the missing ones (files land under
their global case numbers, so the later full-container fill skips them).

  python scripts/container_priority.py [eoff|eon|both]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import validation_container as vc
from hexpyro.pipeline import artifacts, stages
from hexpyro.sampling import lhs


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    modes = ["eoff", "eon"] if which == "both" else [which]
    csv = vc.ensure_draw()
    cases = np.atleast_2d(lhs.read_cases_csv(csv))

    for mode in modes:
        eon = mode == "eon"
        pick = stages.pick_validation_cases(cases, eon, picker="reference-valid")
        for mech in vc.PAIRINGS[mode]:
            cfg = vc.container_cfg(mech, eon)
            tag = "NUIG" if mech.startswith("NUIG") else mech
            missing = [
                k for k in pick
                if not os.path.exists(os.path.join(
                    cfg.dataset_dir,
                    artifacts.trajectory_case_filename(tag, eon, k + 1)))
            ]
            print(f"[priority] {mech} {mode}: picks {pick}, "
                  f"missing {missing}", flush=True)
            if missing:
                stages.stage_simulate(cfg, only_ids=np.asarray(missing))


if __name__ == "__main__":
    main()
