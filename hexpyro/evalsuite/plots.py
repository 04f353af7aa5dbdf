"""Figure suite mirroring the reference's visual evaluation outputs.

  * plot_trajectories       -- per-case 3x3 species grid, predicted curve vs
                               reference points + info panels
                               (Eoff_surrogate_model_training.py:324-368)
  * plot_two_model_comparison -- two mechanisms, three conditions, 3x3 grid
                               with solid/dashed styles and per-condition colors
                               (surrogate_model_Eoff_validation_plot.py:245-358)
  * parity_plot / residual_plot -- MLP eval with R^2 annotation
                               (temp_profile_model_training_2D.py:252-273)
  * error_histograms        -- per-case RMSE/MAE/RelErr trio (:279-344)
  * sampling_corner_plot    -- LHS visualization (Latin_hypercube_sampling_2D.py:39-81,
                               matplotlib instead of plotly)

All functions take numpy arrays and return a matplotlib Figure (no disk I/O,
no global state); callers save with fig.savefig.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from .metrics import r2_score

SPECIES_7 = ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H8-1", "NC6H14"]


def _info_panel(ax, text: str) -> None:
    ax.axis("off")
    ax.text(0.5, 0.5, text, ha="center", va="center", fontsize=11, wrap=True)


def plot_trajectories(t, y_pred, y_ref, T0: float, P0: float, species=SPECIES_7):
    """One case: y_pred/y_ref (n_species, n_time) [mol/m^3], t (n_time,) [s]."""
    t = np.asarray(t)
    y_pred = np.asarray(y_pred)
    y_ref = np.asarray(y_ref)
    losses = np.abs((y_pred[:, -1] - y_ref[:, -1]) * 100 / (y_ref[:, -1] + 1e-6))

    fig, axes = plt.subplots(3, 3, figsize=(12, 9))
    axes = axes.flatten()
    for i, name in enumerate(species):
        ax = axes[i]
        ax.plot(t, y_pred[i], label="Predicted", linewidth=3, color="red")
        ax.scatter(t, y_ref[i], label="Reference", s=10, color="blue")
        ax.set_title(name)
        ax.set_xlabel("Time [s]")
        ax.set_ylabel("Concentration [mol/m3]")
        ax.legend()
    _info_panel(axes[7], f"Temperature: {T0:.2f} K\nPressure: {P0 / 1e3:.2f} kPa")
    _info_panel(
        axes[8],
        "Final product loss:\n"
        + "\n".join(f"{species[i]}: {losses[i]:.2f} %" for i in range(len(species))),
    )
    fig.tight_layout()
    return fig


def plot_two_model_comparison(
    t_list_a, y_list_a, t_list_b, y_list_b, conditions,
    model_names=("model A", "model B"), species=SPECIES_7,
    y_ref_a=None, y_ref_b=None, ref_sparsity=80,
):
    """Three conditions x two models: y_list_* are lists of (n_species, n_time).

    Mirrors plot_sol_3_two_models (surrogate_model_Eoff_validation_plot.py:
    245-358): solid = model A, dashed = model B, one color per condition, two
    info panels. When y_ref_a / y_ref_b are given (lists of (n_species, n_time)
    truth on each model's grid), the reference is scattered every
    `ref_sparsity` points with open ^/s markers like the reference (:308-318).
    """
    import matplotlib.lines as mlines

    colors = ["tab:blue", "tab:orange", "tab:green"]
    fig, axes = plt.subplots(3, 3, figsize=(13, 10))
    axes = axes.flatten()
    for i, name in enumerate(species):
        ax = axes[i]
        for c, (ta, ya, tb, yb) in enumerate(
            zip(t_list_a, y_list_a, t_list_b, y_list_b)
        ):
            ta, tb = np.asarray(ta), np.asarray(tb)
            ax.plot(ta, np.asarray(ya)[i], "-", color=colors[c], lw=2)
            ax.plot(tb, np.asarray(yb)[i], "--", color=colors[c], lw=2)
            if y_ref_a is not None:
                ax.scatter(ta[::ref_sparsity], np.asarray(y_ref_a[c])[i, ::ref_sparsity],
                           color=colors[c], marker="^", facecolors="none", s=70)
            if y_ref_b is not None:
                ax.scatter(tb[::ref_sparsity], np.asarray(y_ref_b[c])[i, ::ref_sparsity],
                           color=colors[c], marker="s", facecolors="none", s=70)
        ax.set_title(name)
        ax.set_xlabel("Time [s]")
        ax.set_ylabel("Concentration [mol/m3]")
    cond_txt = "\n".join(
        f"C{c + 1}: T={cond[0]:.1f} K, P={cond[1] / 1e3:.1f} kPa"
        for c, cond in enumerate(conditions)
    )
    _info_panel(axes[7], cond_txt)
    handles = [
        mlines.Line2D([], [], color="black", ls="-", label=f"{model_names[0]} (solid)"),
        mlines.Line2D([], [], color="black", ls="--", label=f"{model_names[1]} (dashed)"),
    ]
    # one legend entry per plotted truth marker set ('^' rides model A's grid,
    # 's' rides model B's): the entry must match what is actually scattered
    if y_ref_a is not None:
        label = ("reference (truth)" if y_ref_b is None
                 else f"truth ({model_names[0]} mech)")
        handles.append(
            mlines.Line2D([], [], color="black", marker="^", ls="None",
                          markerfacecolor="none", label=label)
        )
    if y_ref_b is not None:
        label = ("reference (truth)" if y_ref_a is None
                 else f"truth ({model_names[1]} mech)")
        handles.append(
            mlines.Line2D([], [], color="black", marker="s", ls="None",
                          markerfacecolor="none", label=label)
        )
    axes[8].axis("off")
    axes[8].legend(handles=handles, loc="center", fontsize=12)
    fig.tight_layout()
    return fig


def parity_plot(y_true, y_pred, xlabel="Simulation Output", ylabel="Prediction Output"):
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    r2 = r2_score(y_true, y_pred)
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.scatter(y_true, y_pred, alpha=0.6, color="blue", s=20, label="Prediction vs True")
    lims = [min(y_true.min(), y_pred.min()), max(y_true.max(), y_pred.max())]
    ax.plot(lims, lims, color="red", linewidth=2, label="Ideal: y = x")
    ax.text(
        0.05, 0.95, f"$R^2$ = {r2:.6f}", transform=ax.transAxes, fontsize=16,
        verticalalignment="top",
        bbox=dict(boxstyle="round,pad=0.4", edgecolor="gray", facecolor="white"),
    )
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.legend()
    fig.tight_layout()
    return fig


def residual_plot(y_true, y_pred, xlabel="Simulation Output"):
    y_true = np.asarray(y_true).ravel()
    y_pred = np.asarray(y_pred).ravel()
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.scatter(y_true, y_pred - y_true, alpha=0.5, s=15)
    ax.axhline(0.0, color="red", lw=1.5)
    ax.set_xlabel(xlabel)
    ax.set_ylabel("Residual (pred - true)")
    fig.tight_layout()
    return fig


def error_histograms(y_true, y_pred):
    """Per-case RMSE / MAE / RelErr histograms; returns one 3-panel Figure."""
    from .metrics import per_case_stats

    stats = per_case_stats(y_true, y_pred)
    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    specs = [
        ("rmse", "RMSE per Case", "skyblue"),
        ("mae", "MAE per Case", "lightcoral"),
        ("rel_error_pct", "Relative Error [%] per Case", "orange"),
    ]
    for ax, (key, label, color) in zip(axes, specs):
        ax.hist(stats[key], bins=30, color=color, edgecolor="black")
        ax.set_xlabel(label)
        ax.set_ylabel("Number of Cases")
        ax.grid(True)
    fig.tight_layout()
    return fig


def sampling_corner_plot(cases, names=None):
    """Corner plot of LHS samples: histograms on the diagonal, scatters below."""
    cases = np.asarray(cases)
    d = cases.shape[1]
    names = names or ["T [K]", "P [bar]", "L [m]", "u0 [m/s]"][:d]
    fig, axes = plt.subplots(d, d, figsize=(3 * d, 3 * d))
    axes = np.atleast_2d(axes)
    for i in range(d):
        for j in range(d):
            ax = axes[i, j]
            if i == j:
                ax.hist(cases[:, i], bins=25, color="steelblue", edgecolor="black")
            elif j < i:
                ax.scatter(cases[:, j], cases[:, i], s=6, alpha=0.6)
            else:
                ax.axis("off")
            if i == d - 1:
                ax.set_xlabel(names[j])
            if j == 0:
                ax.set_ylabel(names[i])
    fig.tight_layout()
    return fig
