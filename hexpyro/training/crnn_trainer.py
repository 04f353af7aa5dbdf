"""CRNN neural-ODE trainer.

Reference recipe (SURROGATE_MODEL_TRAINING/Eoff_surrogate_model_training.py):
  * dataset: per-case trajectory txt, concentrations x1e3 -> mol/m^3 (:87),
    yscale = clamp(max-min, 1e-6) (:110), 80/10/10 split random_state=42 (:61);
  * i_obs = first ns-2 species (observed; excludes the two reservoir species C4H10,
    C5H10-1) (:67);
  * per-experiment dopri5 solve (atol 1e-3, rtol 1e-2) with linearly
    interpolated T(t) (:390-397) -- P(t) is interpolated but unused by the RHS
    (:297, dead code not reproduced);
  * loss = MSE of yscale-normalized curves (:401-410); AdamW lr 5e-3 (torch
    default weight decay 0.01), ReduceLROnPlateau(0.6, patience 5, thr 1e-4)
    on validation loss (:515), grad-clip norm 200 (:19);
  * per-epoch npz history of converted (w_in, w_b, w_out) (:459-468).

TPU-native difference: experiments are solved as vmapped BATCHES inside one
jitted update instead of 640 sequential python-loop solves per epoch. With
batch_size=1 the optimizer sees the same per-sample SGD as the reference;
larger batches trade optimizer noise for wall-clock (default 32).

Eon variant (Eon_surrogate_model_training.py:118-195): the measured T profiles
are replaced by the temp-MLP prediction from (T0, P0) before training, so the
CRNN is trained on exactly the inputs it will see at deployment.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from ..pipeline import artifacts
from ..solvers.dopri5 import odeint_dopri5
from ..surrogate import mlp as mlp_mod
from ..surrogate.crnn import NS, CRNNConfig, crnn_rhs, parameter_converter
from .schedules import plateau_init, plateau_step


@dataclasses.dataclass
class CRNNDataset:
    tsteps: np.ndarray  # (n_exp, ntotal)
    ylabel: np.ndarray  # (n_exp, ns, ntotal) [mol/m^3]
    Tlist: np.ndarray  # (n_exp, ntotal)
    Plist: np.ndarray  # (n_exp, ntotal)
    u0: np.ndarray  # (n_exp, ns)
    yscale: np.ndarray  # (n_exp, ns)


def load_crnn_dataset(paths: list[str], ns: int = NS) -> CRNNDataset:
    """Load trajectory txts with the reference reader semantics (:83-110)."""
    ts, ys, Ts, Ps = [], [], [], []
    for p in paths:
        d = artifacts.read_trajectory_txt(p, ns)
        ts.append(d["t"])
        ys.append(d["C"].T * 1.0e3)  # kmol/m^3 -> mol/m^3
        Ts.append(d["T"])
        Ps.append(d["P"])
    tsteps = np.stack(ts)
    ylabel = np.stack(ys)
    return CRNNDataset(
        tsteps=tsteps,
        ylabel=ylabel,
        Tlist=np.stack(Ts),
        Plist=np.stack(Ps),
        u0=ylabel[:, :, 0],
        yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
    )


def substitute_temp_profiles(ds: CRNNDataset, mlp_params, out_min, out_max) -> CRNNDataset:
    """Replace measured T(t) by the temp-MLP prediction (Eon recipe :118-195)."""
    T0 = ds.Tlist[:, 0]
    P0 = ds.Plist[:, 0]
    x = np.stack([T0, P0], axis=1)
    scale = np.array([[870.0, 1.0e5], [1150.0, 3.0e5]])  # Pa (:129-130)
    xn = jnp.asarray(mlp_mod.normalize_inputs(x, scale), jnp.float32)
    model = mlp_mod.ProfileMLP(output_node=ds.tsteps.shape[1] - 1)
    pred = np.asarray(model.apply({"params": mlp_params}, xn))
    pred = pred * (out_max - out_min) + out_min
    Tlist = np.concatenate([T0[:, None], pred], axis=1)
    return dataclasses.replace(ds, Tlist=Tlist.astype(ds.Tlist.dtype))


@dataclasses.dataclass
class CRNNTrainConfig:
    epochs: int = 300
    batch_size: int = 32
    learning_rate: float = 5e-3
    weight_decay: float = 0.01  # torch AdamW default; wide run uses 1e-4
    grad_clip: float = 200.0  # 10.0 in wide (:WIDE 19)
    rtol: float = 1e-2
    atol: float = 1e-3
    split_seed: int = 42
    shuffle_seed: int = 0
    n_obs: int = NS - 2
    plateau_factor: float = 0.6
    plateau_patience: int = 5
    plateau_threshold: float = 1e-4
    # adaptive-step budget per output interval: at the training tolerances the
    # solver lands on each grid point in ~1 accepted step (measured on the
    # 800-case flagship dataset: valid loss identical at budgets 8/4/2), so a
    # small budget cuts per-step cost ~linearly; 4 keeps reject headroom
    max_steps_per_interval: int = 4
    # training dtype: f32 matches the reference (torch default dtype) and is
    # the TPU-native path; f64 available for CPU verification runs
    dtype: str = "f32"
    save_path: str | None = None
    save_every: int = 10
    # optional early stop once the epoch train loss reaches this level (the
    # reference stops by wall-clock judgement at 141-300 epochs; a target lets
    # long flagship runs release the chip as soon as parity is reached)
    stop_at_train_loss: float | None = None
    # when set alongside stop_at_train_loss, BOTH must be met before the early
    # stop fires (the reference publishes train AND valid anchors; stopping on
    # train alone can leave the valid anchor unbeaten)
    stop_at_valid_loss: float | None = None
    # resume from save_path if it exists: full state (params + optimizer +
    # plateau) from the sidecar `<save_path>.state.npz` when present, else
    # params from `updated_p` with the plateau controller state recovered
    # exactly by replaying the recorded validation losses. History appends
    # instead of restarting, so the npz keeps the complete loss curve.
    resume: bool = True
    # on resume, override the replayed plateau LR scale with this value (the
    # effective lr becomes learning_rate * resume_lr_scale). Use to restart a
    # run whose plateau cascade collapsed the LR (e.g. after the training data
    # or substituted profiles changed, which resets the loss surface).
    resume_lr_scale: float | None = None
    # data-parallel training over the device mesh: shard the per-step batch
    # axis across jax.devices() (parameters/optimizer replicated, XLA inserts
    # the gradient psum). Engages automatically when more than one device is
    # present and batch_size divides evenly; loss semantics are unchanged
    # (same mean over the same global batch).
    use_mesh: bool = True


def make_splits(n_exp: int, seed: int = 42):
    """80/10/10 split matching the reference exactly (:61-62)."""
    train_idx, tmp = train_test_split(np.arange(n_exp), test_size=0.2, random_state=seed)
    valid_idx, test_idx = train_test_split(tmp, test_size=0.5, random_state=seed)
    return train_idx, valid_idx, test_idx


def predict_batch(p, cfg: CRNNConfig, tsteps, Tlist, u0, rtol, atol, max_spi=8):
    """Solve the CRNN ODE for a batch of experiments. Returns (B, ntotal, ns)."""
    w_in, w_b, w_out = parameter_converter(p, cfg)

    def one(ts_row, T_row, u0_row):
        rhs = lambda t, u: crnn_rhs(
            u, jnp.interp(t, ts_row, T_row), w_in, w_b, w_out, cfg
        )
        return odeint_dopri5(
            rhs, u0_row, ts_row, rtol=rtol, atol=atol, max_steps_per_interval=max_spi
        )

    sol = jax.vmap(one)(tsteps, Tlist, u0)
    return jnp.clip(sol, cfg.lb, cfg.ub)


def batch_loss(p, cfg: CRNNConfig, tsteps, Tlist, u0, ylabel, yscale, tcfg: CRNNTrainConfig):
    """Mean of the reference per-experiment losses over the batch (:401-410)."""
    sol = predict_batch(
        p, cfg, tsteps, Tlist, u0, tcfg.rtol, tcfg.atol, tcfg.max_steps_per_interval
    )  # (B, T, ns)
    pred = jnp.swapaxes(sol, 1, 2)[:, : tcfg.n_obs, :]  # (B, n_obs, T)
    ref = ylabel[:, : tcfg.n_obs, :]
    ysc = yscale[:, : tcfg.n_obs, None]
    return jnp.mean(((pred - ref) / ysc) ** 2)


def _load_history(save_path: str):
    """Load the saved loss curves + per-epoch parameters as python lists."""
    with np.load(save_path, allow_pickle=True) as z:
        return {
            "train_loss": [float(v) for v in z["train_loss"]],
            "valid_loss": [float(v) for v in z["valid_loss"]],
            "parameters": list(z["parameters"]),
        }


def _replay_plateau(valid_losses, tcfg: "CRNNTrainConfig"):
    """Recover the exact plateau-controller state from a recorded loss curve."""
    st = plateau_init()
    for v in valid_losses:
        st = plateau_step(
            st, jnp.asarray(v, jnp.float32), factor=tcfg.plateau_factor,
            patience=tcfg.plateau_patience, threshold=tcfg.plateau_threshold,
        )
    return st


def _try_resume(tcfg: "CRNNTrainConfig", opt_state_template, dt):
    """Return (p, opt_state, plateau, history, start_epoch) or None."""
    path = tcfg.save_path
    if not (tcfg.resume and path and os.path.exists(path)):
        return None
    history = _load_history(path)
    start = len(history["train_loss"])
    if start == 0:
        return None
    plateau = _replay_plateau(history["valid_loss"], tcfg)
    state_path = path + ".state.npz"
    p = opt_state = None
    if os.path.exists(state_path):
        try:
            leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
            with np.load(state_path) as z:
                # a crash between the history write and the sidecar write can
                # leave a stale sidecar; a silent epoch mismatch would resume
                # old parameters under a newer loss curve
                if int(z["epoch"]) != start:
                    raise ValueError(
                        f"sidecar epoch {int(z['epoch'])} != history epoch {start}"
                    )
                new = [
                    jnp.asarray(z[f"opt_{i}"], leaves[i].dtype)
                    for i in range(len(leaves))
                ]
                p = jnp.asarray(z["p"], dt)
            opt_state = jax.tree_util.tree_unflatten(treedef, new)
        except Exception as e:  # layout drift (optax upgrade) / stale sidecar
            print(f"resume: sidecar state unusable ({e}); params-only resume")
            p = opt_state = None
    if p is None:
        with np.load(path, allow_pickle=True) as z:
            if "updated_p" not in z.files:
                return None
            p = jnp.asarray(np.asarray(z["updated_p"]), dt)
    return p, opt_state, plateau, history, start


def train_crnn(
    p0: np.ndarray,
    ds: CRNNDataset,
    cfg: CRNNConfig,
    tcfg: CRNNTrainConfig,
    verbose: bool = True,
):
    """Full training loop; returns (p, history dict)."""
    n_exp = ds.tsteps.shape[0]
    train_idx, valid_idx, _ = make_splits(n_exp, tcfg.split_seed)

    dt = jnp.float32 if tcfg.dtype == "f32" else jnp.float64
    data = {
        "tsteps": jnp.asarray(ds.tsteps, dt),
        "Tlist": jnp.asarray(ds.Tlist, dt),
        "u0": jnp.asarray(ds.u0, dt),
        "ylabel": jnp.asarray(ds.ylabel, dt),
        "yscale": jnp.asarray(ds.yscale, dt),
    }

    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=tcfg.learning_rate, weight_decay=tcfg.weight_decay
        ),
    )
    p = jnp.asarray(p0, dt)
    opt_state = opt.init(p)

    def gather(idx):
        return tuple(data[k][idx] for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale"))

    @jax.jit
    def train_epoch(p, opt_state, batches, lr):
        def one(carry, batch):
            p, opt_state, total = carry
            ts, Tl, u0, yl, ysc = batch
            loss, grads = jax.value_and_grad(batch_loss)(
                p, cfg, ts, Tl, u0, yl, ysc, tcfg
            )
            updates, opt_state = opt.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state, total + loss), None

        opt_state[1].hyperparams["learning_rate"] = lr
        (p, opt_state, total), _ = jax.lax.scan(one, (p, opt_state, jnp.zeros(())), batches)
        return p, opt_state, total / batches[0].shape[0]

    @jax.jit
    def eval_loss(p, ts, Tl, u0, yl, ysc):
        return batch_loss(p, cfg, ts, Tl, u0, yl, ysc, tcfg)

    plateau = plateau_init()
    history = {"train_loss": [], "valid_loss": [], "parameters": []}
    start_epoch = 0
    resumed = _try_resume(tcfg, opt_state, dt)
    if resumed is not None:
        p, r_opt_state, plateau, history, start_epoch = resumed
        if r_opt_state is not None:
            opt_state = r_opt_state
        if tcfg.resume_lr_scale is not None:
            plateau = plateau._replace(
                scale=jnp.asarray(tcfg.resume_lr_scale, jnp.float32),
                best=jnp.asarray(np.inf, jnp.float32),
                num_bad=jnp.zeros((), jnp.int32),
            )
        if verbose:
            kind = "full-state" if r_opt_state is not None else "params+plateau"
            print(
                f"resuming ({kind}) from {tcfg.save_path}: epoch {start_epoch}, "
                f"lr scale {float(plateau.scale):.4g}"
            )
    rng = np.random.default_rng([tcfg.shuffle_seed, start_epoch])
    valid_batch = gather(jnp.asarray(valid_idx))

    bs = tcfg.batch_size
    n_batches = max(1, len(train_idx) // bs)

    # multi-device data parallelism (the TPU-native Pool replacement for the
    # training stage, SURVEY.md section 2): batch axis sharded, params
    # replicated; XLA partitions the vmapped ODE solves and inserts one psum
    # for the loss/grad reduction. Placement-only change -- the jitted update
    # computes the identical global-batch mean.
    batch_shard = None
    n_dev = jax.device_count()
    if tcfg.use_mesh and n_dev > 1 and bs % n_dev == 0:
        from ..parallel import mesh as pmesh
        from jax.sharding import NamedSharding, PartitionSpec as JP

        dp_mesh = pmesh.make_mesh()
        batch_shard = NamedSharding(dp_mesh, JP(None, pmesh.CASES_AXIS))
        rep = pmesh.replicated(dp_mesh)
        p = jax.device_put(p, rep)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), opt_state
        )
        if len(valid_idx) % n_dev == 0:
            vb_shard = pmesh.case_sharding(dp_mesh)
            valid_batch = tuple(jax.device_put(v, vb_shard) for v in valid_batch)
        if verbose:
            print(f"sharding batch axis {bs} over {n_dev} devices")
    for epoch in range(start_epoch, tcfg.epochs):
        perm = rng.permutation(len(train_idx))[: n_batches * bs]
        idx = jnp.asarray(np.asarray(train_idx)[perm].reshape(n_batches, bs))
        batches = tuple(
            jnp.stack([data[k][idx[i]] for i in range(n_batches)])
            for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale")
        )
        if batch_shard is not None:
            batches = tuple(jax.device_put(b, batch_shard) for b in batches)
        lr = tcfg.learning_rate * float(plateau.scale)
        p, opt_state, train_loss = train_epoch(p, opt_state, batches, lr)
        valid_loss = eval_loss(p, *valid_batch)
        plateau = plateau_step(
            plateau,
            valid_loss,
            factor=tcfg.plateau_factor,
            patience=tcfg.plateau_patience,
            threshold=tcfg.plateau_threshold,
        )
        w_in, w_b, w_out = parameter_converter(p, cfg)
        history["train_loss"].append(float(train_loss))
        history["valid_loss"].append(float(valid_loss))
        history["parameters"].append(
            {
                "w_in": np.asarray(w_in),
                "w_b": np.asarray(w_b),
                "w_out": np.asarray(w_out),
            }
        )
        if verbose:
            print(
                f"epoch {epoch + 1}/{tcfg.epochs} train {float(train_loss):.6f} "
                f"valid {float(valid_loss):.6f} lr {lr:.2e}"
            )
        if tcfg.save_path and ((epoch + 1) % tcfg.save_every == 0):
            _save(tcfg.save_path, history, p, opt_state=opt_state)
        if (
            tcfg.stop_at_train_loss is not None
            and float(train_loss) <= tcfg.stop_at_train_loss
            and (
                tcfg.stop_at_valid_loss is None
                or float(valid_loss) <= tcfg.stop_at_valid_loss
            )
        ):
            if verbose:
                print(f"early stop: train loss {float(train_loss):.6f} <= "
                      f"{tcfg.stop_at_train_loss:.6f} at epoch {epoch + 1}")
            break

    if tcfg.save_path:
        _save(tcfg.save_path, history, p, opt_state=opt_state, final=True)
    return np.asarray(p), history


def _save(path, history, p, opt_state=None, final=False):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # updated_p is written at EVERY checkpoint (the reference writes it only in
    # the final record) so an interrupted run resumes from the latest epoch,
    # not from nothing; consumers still read parameters[-1] as before
    artifacts.save_crnn_history(
        path,
        history["train_loss"],
        history["valid_loss"],
        history["parameters"],
        final=history["parameters"][-1] if final else None,
        updated_p=np.asarray(p),
    )
    if opt_state is not None:
        # optimizer sidecar (internal format, not part of the reference npz
        # layout): lets an interrupted run restore AdamW moments + the exact
        # learning rate instead of re-warming from scratch
        leaves = jax.tree_util.tree_leaves(opt_state)
        np.savez(
            path + ".state.npz",
            p=np.asarray(p),
            epoch=len(history["train_loss"]),
            **{f"opt_{i}": np.asarray(l) for i, l in enumerate(leaves)},
        )


def adam_param_scale(state_path: str, clip_range: float = 1e3) -> np.ndarray | None:
    """Per-parameter scale 1/(sqrt(nu)+eps) from a checkpoint sidecar.

    The sidecar stores the AdamW optimizer leaves (`_save`); nu (the second
    moment EMA) is the (n_params,) leaf with the smallest magnitude that is
    everywhere >= 0 and not integral -- in the optax chain
    (clip_by_global_norm, inject_hyperparams(adamw)) the float leaves of
    param shape are exactly [mu, nu]. Returns the scale normalized to
    median 1 and clipped to [1/clip_range, clip_range] so dead parameters
    (nu ~ 0) cannot explode the preconditioner; None if no usable sidecar.
    """
    if not os.path.exists(state_path):
        return None
    with np.load(state_path) as z:
        p_shape = z["p"].shape
        cands = [
            np.asarray(z[k])
            for k in z.files
            if k.startswith("opt_") and z[k].shape == p_shape
            and np.issubdtype(z[k].dtype, np.floating)
        ]
    # [mu, nu]: nu is the one that is everywhere non-negative; with ties
    # (mu also >= 0), nu is the second in optax's adamw leaf order
    nonneg = [c for c in cands if (c >= 0).all()]
    if not nonneg:
        return None
    nu = nonneg[-1]
    s = 1.0 / (np.sqrt(np.maximum(nu, 0.0)) + 1e-12)
    s = s / np.median(s)
    return np.clip(s, 1.0 / clip_range, clip_range)


def polish_crnn(
    p0: np.ndarray,
    ds: CRNNDataset,
    cfg: CRNNConfig,
    tcfg: CRNNTrainConfig,
    *,
    maxiter: int = 150,
    eval_chunk: int = 80,
    stop_train: float | None = None,
    stop_valid: float | None = None,
    save_path: str | None = None,
    param_scale: np.ndarray | None = None,
    verbose: bool = True,
):
    """Full-batch L-BFGS polish of a converged AdamW run.

    The CRNN has only nr*(3+2*ns) = 189 parameters against ~3.6M residuals
    (640 cases x 7 species x 801 points), so once plateau-SGD stalls at the
    basin bottom the right tool is a quasi-Newton step on the FULL train
    loss: one jitted value_and_grad per iteration (the whole train split
    vmapped through dopri5 on device, lax.map over `eval_chunk`-case blocks
    to bound activation memory), with scipy's L-BFGS-B driving the 189-dim
    update on the host. The reference has no equivalent (it stops when AdamW
    stops, Eoff_surrogate_model_training.py:416-451); this is a capability
    on top of reference parity, used to finish the deepest Eon anchors.

    Tracks the best (train+valid) iterate and never returns a point worse
    than the input. If save_path is given, appends ONE history entry (the
    chosen iterate, losses computed with the standard definitions) so
    downstream consumers keep reading `parameters[-1]`.

    `param_scale` is a per-parameter diagonal preconditioner: the optimizer
    works in z = p / param_scale. The raw parameterization's gradient scales
    span orders of magnitude (clamped slopes vs w_out entries), which AdamW
    normalizes away but leaves L-BFGS's first line searches with steps too
    small to change f at f32 granularity (observed: instant "converged" with
    zero descent). The natural scale is Adam's own metric, 1/(sqrt(nu)+eps)
    from the checkpoint sidecar -- see `adam_param_scale`.

    Returns (p_best, train_loss, valid_loss, info).
    """
    from scipy.optimize import minimize

    dt = jnp.float32 if tcfg.dtype == "f32" else jnp.float64
    train_idx, valid_idx, _ = make_splits(ds.tsteps.shape[0], tcfg.split_seed)
    n_keep = (len(train_idx) // eval_chunk) * eval_chunk
    if n_keep < len(train_idx) and verbose:
        print(f"polish: evaluating {n_keep}/{len(train_idx)} train cases "
              f"(multiple of eval_chunk={eval_chunk})")
    tidx = np.asarray(train_idx)[:n_keep].reshape(-1, eval_chunk)

    def gather(idx):
        return tuple(
            jnp.asarray(getattr(ds, k)[idx], dt)
            for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale")
        )

    train_blocks = gather(tidx)  # leading axes (n_blocks, eval_chunk, ...)
    valid_batch = gather(np.asarray(valid_idx))

    @jax.jit
    def train_value_and_grad(p):
        def full_loss(p):
            losses = jax.lax.map(
                lambda b: batch_loss(p, cfg, *b, tcfg), train_blocks
            )
            return jnp.mean(losses)

        return jax.value_and_grad(full_loss)(p)

    @jax.jit
    def valid_loss_fn(p):
        return batch_loss(p, cfg, *valid_batch, tcfg)

    scale = (
        np.ones(np.asarray(p0).shape, np.float64)
        if param_scale is None
        else np.asarray(param_scale, np.float64)
    )
    state = {"evals": 0, "last_x": None, "last_f": None}

    def fun(z):
        f, g = train_value_and_grad(jnp.asarray(z * scale, dt))
        f = float(f)
        g = np.asarray(g, np.float64) * scale
        # a diverged ODE solve (non-finite loss/grad) must read as "very bad",
        # not poison the line search or get saved as a result
        if not np.isfinite(f):
            f = 1e10
        g = np.where(np.isfinite(g), g, 0.0)
        state["evals"] += 1
        state["last_x"] = np.asarray(z)
        state["last_f"] = f
        return f, g

    x0 = np.asarray(p0, np.float64) / scale
    f0, _ = fun(x0)
    v0 = float(valid_loss_fn(jnp.asarray(np.asarray(p0), dt)))
    best = {"x": np.asarray(p0, np.float64), "train": f0, "valid": v0}
    if verbose:
        print(f"polish start: train {f0:.6e} valid {v0:.6e}")

    class _Done(Exception):
        pass

    def callback(zk):
        pk = np.asarray(zk) * scale
        # L-BFGS-B's accepted iterate is its most recent objective evaluation,
        # so reuse that value instead of re-running the full-batch solve
        if state["last_x"] is not None and np.array_equal(zk, state["last_x"]):
            f = state["last_f"]
        else:
            f = float(train_value_and_grad(jnp.asarray(pk, dt))[0])
        v = float(valid_loss_fn(jnp.asarray(pk, dt)))
        if f + v < best["train"] + best["valid"]:
            best.update(x=pk, train=f, valid=v)
        if verbose:
            print(f"polish iter: train {f:.6e} valid {v:.6e}", flush=True)
        if (
            stop_train is not None and f <= stop_train
            and (stop_valid is None or v <= stop_valid)
        ):
            best.update(x=pk, train=f, valid=v)
            raise _Done

    result_status = "maxiter"
    try:
        res = minimize(
            fun, x0, jac=True, method="L-BFGS-B", callback=callback,
            options={"maxiter": maxiter, "maxcor": 30, "ftol": 1e-14,
                     "gtol": 1e-12},
        )
        result_status = str(res.message)
    except _Done:
        result_status = "target reached"

    p_best = jnp.asarray(best["x"], dt)
    if save_path is not None and not (
        np.isfinite(best["train"]) and np.isfinite(best["valid"])
        and best["train"] < 1e9  # 1e10 is the diverged-solve sentinel
    ):
        if verbose:
            print("polish: best point non-finite; nothing saved")
        save_path = None
    if save_path is not None:
        history = (
            _load_history(save_path)
            if os.path.exists(save_path)
            else {"train_loss": [], "valid_loss": [], "parameters": []}
        )
        w_in, w_b, w_out = parameter_converter(p_best, cfg)
        history["train_loss"].append(best["train"])
        history["valid_loss"].append(best["valid"])
        history["parameters"].append(
            {"w_in": np.asarray(w_in), "w_b": np.asarray(w_b),
             "w_out": np.asarray(w_out)}
        )
        _save(save_path, history, p_best, final=True)
    info = {"status": result_status, "n_evals": state["evals"]}
    if verbose:
        print(f"polish done ({result_status}, {state['evals']} evals): "
              f"train {best['train']:.6e} valid {best['valid']:.6e}")
    return np.asarray(p_best), best["train"], best["valid"], info


def eval_crnn_f32(p, ds: CRNNDataset, cfg: CRNNConfig, tcfg: CRNNTrainConfig):
    """(train, valid) loss at f32 — the reference npz loss convention.

    Used to report f64-polished parameters in the same units as the
    reference training histories (Eon_surrogate_model_training.py:281-293).
    """
    tr_idx, va_idx, _ = make_splits(ds.tsteps.shape[0], tcfg.split_seed)
    out = []
    for idx in (jnp.asarray(tr_idx), jnp.asarray(va_idx)):
        out.append(float(batch_loss(
            jnp.asarray(p, jnp.float32), cfg,
            jnp.asarray(ds.tsteps, jnp.float32)[idx],
            jnp.asarray(ds.Tlist, jnp.float32)[idx],
            jnp.asarray(ds.u0, jnp.float32)[idx],
            jnp.asarray(ds.ylabel, jnp.float32)[idx],
            jnp.asarray(ds.yscale, jnp.float32)[idx], tcfg,
        )))
    return tuple(out)


def test_crnn(p, ds: CRNNDataset, cfg: CRNNConfig, tcfg: CRNNTrainConfig):
    """Loss on the held-out test split (reference Trainer.test :492-510)."""
    _, _, test_idx = make_splits(ds.tsteps.shape[0], tcfg.split_seed)
    idx = jnp.asarray(test_idx)
    dt = jnp.float32 if tcfg.dtype == "f32" else jnp.float64
    return float(
        batch_loss(
            jnp.asarray(p, dt), cfg,
            jnp.asarray(ds.tsteps, dt)[idx], jnp.asarray(ds.Tlist, dt)[idx],
            jnp.asarray(ds.u0, dt)[idx], jnp.asarray(ds.ylabel, dt)[idx],
            jnp.asarray(ds.yscale, dt)[idx], tcfg,
        )
    )
