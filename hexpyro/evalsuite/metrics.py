"""Accuracy metric suite, matching the reference's deployment analysis exactly.

Reference: SURROGATE_MODEL/surrogate_model_Eoff_single_model.py:384-480 --
per (case, species): RMSE/NRMSE/relative error both at the final point and
time-averaged, Frechet distance under a Gaussian approximation
sqrt((mu_t-mu_p)^2 + (sigma_t-sigma_p)^2), and max-norm. The initial grid point
is excluded (:417). Also the MLP eval metrics (R^2 parity, MAPE accuracy,
per-case RMSE/MAE/RelErr) from temp_profile_model_training_2D.py:232-344.
"""

from __future__ import annotations

import numpy as np

EPS_REL = 1.0e-5  # reference epsilon_rel (:388)


def trajectory_metrics(true: np.ndarray, pred: np.ndarray) -> dict:
    """All reference metrics for one (species, time-series) pair.

    true/pred: (n_time,) INCLUDING the initial point; it is dropped here
    (reference :417 'Exclude initial molar concentration').
    """
    true = np.asarray(true)[1:]
    pred = np.asarray(pred)[1:]
    true_final, pred_final = true[-1], pred[-1]
    span = true.max() - true.min() + EPS_REL

    rmse_final = np.sqrt((pred_final - true_final) ** 2)
    rmse_time = np.sqrt(np.mean((pred - true) ** 2))
    mu_t, mu_p = true.mean(), pred.mean()
    s_t, s_p = true.std(), pred.std()
    return {
        "RMSE_final": rmse_final,
        "NRMSE_final": rmse_final / span,
        "RelError_final(%)": np.abs(pred_final - true_final) / (true_final + EPS_REL) * 100,
        "RMSE_time_avg": rmse_time,
        "NRMSE_time_avg": rmse_time / span,
        "RelError_time_avg(%)": np.mean(np.abs(pred - true) / (true + EPS_REL)) * 100,
        "FCD": np.sqrt((mu_t - mu_p) ** 2 + (s_t - s_p) ** 2),
        "Max_Norm": np.max(np.abs(pred - true)) / (np.max(np.abs(true)) + EPS_REL),
    }


METRIC_COLUMNS = [
    "Case_ID", "Species_ID", "T_ini [K]", "P_ini [Pa]", "L_ini [m]", "u0_ini [m/s]",
    "RMSE_final", "NRMSE_final", "RelError_final(%)",
    "RMSE_time_avg", "NRMSE_time_avg", "RelError_time_avg(%)", "FCD", "Max_Norm",
]


def metric_table(Y_true, Y_pred, species_names, conditions) -> "object":
    """Per case x species metric rows -> pandas DataFrame (reference CSV layout).

    Y_true/Y_pred: (n_cases, n_species, n_time); conditions: (n_cases, 4) rows
    of (T0 [K], P0 [Pa], L [m], u0 [m/s]).
    """
    import pandas as pd

    rows = []
    for c in range(Y_true.shape[0]):
        for s, name in enumerate(species_names):
            m = trajectory_metrics(Y_true[c, s], Y_pred[c, s])
            rows.append(
                [c + 1, name, *np.asarray(conditions[c], dtype=float)]
                + [m[k] for k in METRIC_COLUMNS[6:]]
            )
    return pd.DataFrame(rows, columns=METRIC_COLUMNS)


# ---------------------------------------------------------------------------
# MLP evaluation metrics (temp_profile_model_training_2D.py:232-344)
# ---------------------------------------------------------------------------


def r2_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    ss_res = np.sum((y_true - y_pred) ** 2)
    ss_tot = np.sum((y_true - y_true.mean()) ** 2)
    return 1.0 - ss_res / ss_tot


def mape_accuracy(y_true, y_pred) -> np.ndarray:
    """(1 - |err|/|true|) * 100, elementwise (reference :233-234)."""
    return (1.0 - np.abs(y_pred - y_true) / np.abs(y_true)) * 100.0


def per_case_stats(y_true, y_pred) -> dict:
    """Per-case RMSE / MAE / relative-error arrays (reference :279-344)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    rmse = np.sqrt(np.mean((y_pred - y_true) ** 2, axis=1))
    mae = np.mean(np.abs(y_pred - y_true), axis=1)
    rel = np.mean(np.abs(y_pred - y_true) / (np.abs(y_true) + 1e-12), axis=1) * 100
    return {"rmse": rmse, "mae": mae, "rel_error_pct": rel}
