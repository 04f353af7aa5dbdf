"""Artifact I/O: trajectory txt files, CRNN npz histories, MLP weight files.

Formats are kept interchange-compatible with the reference pipeline so its
checked-in artifacts can be used as golden test anchors and so downstream
consumers can switch frameworks without converting data:

  * trajectory txt (np.savetxt): rows = n_steps+1 grid points, columns
    [t, T, P, C1..C9, u, z] for 2D sweeps and [..., rho] appended for 4D
    (reference: simul_data_gene_fix_chain_2D.py:219-226, ..._4D.py:231-233);
    concentrations are in kmol/m^3 (Cantera units) -- trainers multiply by 1e3;
  * CRNN training history npz: per-epoch 'train_loss', 'valid_loss',
    'parameters' (list of {'w_in','w_b','w_out'} dicts), final record adds
    'final_parameters' and 'updated_p' (Eoff_surrogate_model_training.py:459-487);
  * MLP weights: .npz of flax params + min/max scaler pkl-compatible dict
    ({'min': float, 'max': float}, temp_profile_model_training_2D.py:66-68);
    readers for the reference's torch .pth files are provided for golden tests.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from . import native


# ---------------------------------------------------------------------------
# trajectory txt
# ---------------------------------------------------------------------------

def trajectory_case_filename(mech_name: str, energy_on: bool, k: int) -> str:
    """Reference naming: {MECH}_{Eon|Eoff}_{k}.txt with 1-based case index."""
    mode = "Eon" if energy_on else "Eoff"
    return f"{mech_name}_{mode}_{k}.txt"


def write_trajectory_txt(path: str, t, T, P, C9, u, z, rho=None) -> None:
    """Write one case in the reference column layout.

    C9: (n+1, 9) tracked-species concentrations [kmol/m^3].
    rho: optional (n+1,) density column for 4D sweeps.
    """
    cols = [np.asarray(t), np.asarray(T), np.asarray(P)]
    cols += [np.asarray(C9)[:, i] for i in range(np.asarray(C9).shape[1])]
    cols += [np.asarray(u), np.asarray(z)]
    if rho is not None:
        cols.append(np.asarray(rho))
    mat = np.stack(cols, axis=1)
    if not native.write_matrix(path, mat):  # C++ fast path, numpy fallback
        np.savetxt(path, mat)


def read_trajectory_txt(path: str, ns: int = 9):
    """Read a trajectory txt -> dict of arrays (reference reader semantics).

    Mirrors RawDataDataset.__getitem__ (Eoff_surrogate_model_training.py:83-92):
    columns [t, T, P, C1..Cns, u, z, (rho)].
    """
    raw = native.read_matrix(path)
    raw = (np.loadtxt(path) if raw is None else raw).T
    out = {
        "t": raw[0],
        "T": raw[1],
        "P": raw[2],
        "C": raw[3 : 3 + ns].T,  # (n+1, ns) [kmol/m^3]
        "u": raw[3 + ns],
        "z": raw[4 + ns],
    }
    if raw.shape[0] > 5 + ns:
        out["rho"] = raw[5 + ns]
    return out


def write_sweep(
    out_dir: str, mech_name: str, energy_on: bool, traj, arr, tracked_idx,
    offset: int = 0, include_rho: bool = False, case_ids=None,
    projected: bool = False,
) -> list[str]:
    """Write a batched PFRTrajectory as per-case reference-format txt files.

    include_rho appends the density column used by 4D sweeps
    (INDEPENDENT_DATASET_GENERATION/simul_data_gene_fix_chain_4D.py:231-233).
    case_ids optionally gives explicit 1-based case numbers (scattered
    re-solves, e.g. the stage_simulate rescue pass) instead of offset+b+1.
    projected=True means traj came from simulate_pfr(project_tracked=...):
    its Y field already holds the tracked-species concentrations [kmol/m^3]
    computed on device (pfr.py), so only (B, n+1, 9) crosses the tunnel
    instead of the full (B, n+1, ns) mass-fraction history.
    """
    os.makedirs(out_dir, exist_ok=True)
    if projected:
        C = np.asarray(traj.Y)  # (B, n+1, 9) already concentrations
    else:
        C = np.asarray(traj.concentrations(arr))[:, :, tracked_idx]  # (B, n+1, 9)
    t = np.asarray(traj.t)
    T = np.asarray(traj.T)
    P = np.asarray(traj.P)
    u = np.asarray(traj.u)
    z = np.asarray(traj.z)
    rho = np.asarray(traj.rho)
    paths = []
    n_write = len(case_ids) if case_ids is not None else t.shape[0]
    for b in range(n_write):
        cid = case_ids[b] if case_ids is not None else offset + b + 1
        path = os.path.join(
            out_dir, trajectory_case_filename(mech_name, energy_on, cid)
        )
        write_trajectory_txt(
            path, t[b], T[b], P[b], C[b], u[b], z[b],
            rho=rho[b] if include_rho else None,
        )
        paths.append(path)
    return paths


def write_prediction_txt(path: str, t, T, P, L, u0, species) -> None:
    """Write one deployed-surrogate prediction in the reference layout.

    Columns [t, T, P, L, u0, C1..C_nobs] with P/L/u0 broadcast to the grid,
    fmt %.6e (surrogate_model_Eon_single_model.py:359-369, file name pattern
    pred_{MECH}{on|off}_{idx}.txt).
    """
    t = np.asarray(t)
    ones = np.ones_like(t)
    mat = np.vstack(
        [t, np.asarray(T) * ones, P * ones, L * ones, u0 * ones, np.asarray(species)]
    ).T
    np.savetxt(path, mat, fmt="%.6e")


# ---------------------------------------------------------------------------
# CRNN npz history
# ---------------------------------------------------------------------------

def save_crnn_history(path: str, train_loss, valid_loss, parameters, final=None, updated_p=None):
    """Save in the reference's npz layout; consumers read parameters[-1]."""
    payload = {
        "train_loss": np.asarray(train_loss),
        "valid_loss": np.asarray(valid_loss),
        "parameters": np.array(parameters, dtype=object),
    }
    if final is not None:
        payload["final_parameters"] = np.array(final, dtype=object)
    if updated_p is not None:
        payload["updated_p"] = np.asarray(updated_p)
    # NB: savez has no allow_pickle kwarg (pickling is a load-time decision);
    # passing one would be saved as a spurious array key
    np.savez(path, **payload)


def load_crnn_parameters(path: str):
    """Load final (w_in, w_b, w_out) from an npz history -- reference or ours.

    Mirrors load_npz_parameters (surrogate_model_Eoff_single_model.py:223-230).
    """
    with np.load(path, allow_pickle=True) as z:
        final = z["parameters"][-1]
    return (
        np.asarray(final["w_in"], dtype=np.float64),
        np.asarray(final["w_b"], dtype=np.float64),
        np.asarray(final["w_out"], dtype=np.float64),
    )


def load_crnn_history_losses(path: str):
    with np.load(path, allow_pickle=True) as z:
        return np.asarray(z["train_loss"]), np.asarray(z["valid_loss"])


# ---------------------------------------------------------------------------
# MLP weights + scalers
# ---------------------------------------------------------------------------

def save_minmax_scaler(path: str, min_val: float, max_val: float) -> None:
    """pkl with {'min','max'} -- byte-compatible with the reference's scalers."""
    with open(path, "wb") as f:
        pickle.dump({"min": float(min_val), "max": float(max_val)}, f)


def load_minmax_scaler(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return float(d["min"]), float(d["max"])


def save_mlp_params(path: str, params) -> None:
    """Flax params pytree -> flat npz ('fc{i}/kernel', 'fc{i}/bias')."""
    import jax

    flat = {}
    for kpath, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(
            getattr(p, "key", getattr(p, "name", str(getattr(p, "idx", p))))
            for p in kpath
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_mlp_params_npz(path: str):
    """Load a flat npz back into a nested flax-style dict."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = z[key]
    return out


def import_reference_mlp(pth_path: str, pkl_path: str, out_dir: str, tag: str) -> str:
    """Convert a reference torch .pth + scaler pkl into our MLP dir layout.

    Writes {out_dir}/weights_{tag}.npz + {out_dir}/min_max_{tag}.pkl so the
    reference's trained profile models (TEMP/TIME_PRED_MODEL_PARAMETER_CONTAINER)
    plug directly into stage_deploy / stage_validate -- a user of the reference
    can deploy their existing artifacts on TPU unchanged.
    """
    from ..surrogate import mlp as mlp_mod

    sd = load_torch_mlp_state_dict(pth_path)
    params = mlp_mod.load_torch_weights(sd)
    os.makedirs(out_dir, exist_ok=True)
    save_mlp_params(f"{out_dir}/weights_{tag}.npz", params)
    lo, hi = load_minmax_scaler(pkl_path)
    save_minmax_scaler(f"{out_dir}/min_max_{tag}.pkl", lo, hi)
    return out_dir


def load_torch_mlp_state_dict(path: str):
    """Read a reference .pth MLP checkpoint (torch-cpu) -> numpy dict.

    Keys: fc{1..4}.weight (out, in), fc{1..4}.bias. Used for golden tests
    against the reference's TEMP/TIME_PRED_MODEL_PARAMETER_CONTAINERs.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.numpy().astype(np.float64) for k, v in sd.items()}
