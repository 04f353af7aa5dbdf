#!/usr/bin/env python
"""Finish the LLNL Eon CRNN to below the reference anchors.

Reference (BASELINE.md): train 1.208e-3 / valid 1.100e-3 (242 epochs).
DELIVERED round 3: train 1.104e-3 / valid 1.080e-3
(examples/flagship_llnl_800_eon/).

History of this run (see VALIDATION.md "Eon CRNN loss floor"):
- epochs 1-170: batch-2 AdamW to train ~1.42e-3 (plateau LR collapse)
- epoch ~220: temp-MLP v2 swap (600-epoch MLP, mean |dT| 0.62 -> 0.15 K)
- epochs 220-400: warm-restarted batch-8 AdamW to 1.246e-3/1.238e-3
- round 3: Adam-preconditioned full-batch L-BFGS polish + decaying-amplitude
  explore/polish cycles through the facet stalls, f64 escalation.

The cycle logic now lives in scripts/finish_eon.py (generalized to any
mechanism); this wrapper keeps the historical LLNL entry point.
"""

import os
import runpy
import sys

sys.argv = [sys.argv[0], "LLNL"]
runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "finish_eon.py"),
    run_name="__main__",
)
