"""Latin-hypercube condition sampling, reproducing the reference draws exactly.

Reference: CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/Latin_hypercube_sampling_2D.py
and INDEPENDENT_DATASET_GENERATION/Latin_hypercube_sampling_{2D,4D}.py -- scipy
`qmc.LatinHypercube(d, optimization="random-cd", seed)` scaled to bounds, written
as a headerless CSV. This is offline host-side setup code, so scipy/numpy is the
right tool (SURVEY.md section 7); the checked-in reference CSVs
(`sampling_case_2D.csv` etc.) are byte-compatible reproducibility anchors.

Bounds (reference line refs):
  2D train:       T [870, 1150] K, P [1, 3] bar, n=800, seed=2024   (:23-32)
  2D independent: same bounds, n=400, different seed                 (INDEPENDENT)
  4D:             + L [0.5, 1.0] m, u0 [2.5, 5.0] m/s, n=400, seed=13895 (:22-34)
"""

from __future__ import annotations

import numpy as np
from scipy.stats import qmc

BOUNDS_2D = np.array([[870.0, 1.0], [1150.0, 3.0]])  # T [K], P [bar]
BOUNDS_2D_WIDE = np.array([[820.0, 1.0], [1200.0, 3.0]])
BOUNDS_4D = np.array([[870.0, 1.0, 0.5, 2.5], [1150.0, 3.0, 1.0, 5.0]])

SEED_2D_TRAIN = 2024
SEED_4D = 13895


def latin_hypercube(bounds: np.ndarray, n_samples: int, seed: int) -> np.ndarray:
    """Draw an optimized Latin hypercube in the given bounds.

    bounds: (2, d) [lower; upper]. Returns (n_samples, d).
    """
    d = bounds.shape[1]
    sampler = qmc.LatinHypercube(d=d, optimization="random-cd", seed=seed)
    unit = sampler.random(n=n_samples)
    return qmc.scale(unit, bounds[0], bounds[1])


def sample_2d(n_samples: int = 800, seed: int = SEED_2D_TRAIN, wide: bool = False) -> np.ndarray:
    return latin_hypercube(BOUNDS_2D_WIDE if wide else BOUNDS_2D, n_samples, seed)


def sample_4d(n_samples: int = 400, seed: int = SEED_4D) -> np.ndarray:
    return latin_hypercube(BOUNDS_4D, n_samples, seed)


def write_cases_csv(path: str, cases: np.ndarray) -> None:
    """Headerless CSV, comma-delimited -- the reference's interchange format."""
    np.savetxt(path, cases, delimiter=",")


def read_cases_csv(path: str) -> np.ndarray:
    """Load a sampling CSV (2D: T [K], P [bar]; 4D: + L [m], u0 [m/s])."""
    return np.loadtxt(path, delimiter=",")
