"""Trainer for the temperature-profile and time-grid MLPs.

Reproduces the reference training recipe (TEMP_PRED_MODEL_TRAINING/
temp_profile_model_training_2D.py and TIME_PRED_MODEL_TRAINING/
time_profile_model_training_4D.py): fixed input min-max scale, global output
min/max computed over the WHOLE dataset before splitting (:42-68), 80/10/10
split with random_state=2024 (:57-58), Adam + StepLR(100, 0.6), MSE, batch 32.
Differences (conscious fixes, SURVEY.md "quirks"): the reference's validation
loss accumulator leaks training loss into history_valid (:156-187) -- here the
histories are computed correctly.

The whole epoch runs as one jitted scan over shuffled minibatches -- no
DataLoader process machinery; data lives on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import train_test_split

from ..surrogate import mlp as mlp_mod
from .schedules import step_lr


@dataclasses.dataclass
class MLPTrainConfig:
    input_scale: np.ndarray  # (2, d)
    epochs: int = 20  # 3000 for the time model (reference :25)
    batch_size: int = 32
    learning_rate: float = 1e-3
    lr_step_epochs: int = 100
    lr_gamma: float = 0.6
    split_seed: int = 2024
    init_seed: int = 0
    shuffle_seed: int = 0


@dataclasses.dataclass
class MLPTrainResult:
    model: mlp_mod.ProfileMLP
    params: dict
    out_min: float
    out_max: float
    history_train: list
    history_valid: list
    test_inputs: np.ndarray  # raw (unnormalized) test inputs
    test_outputs: np.ndarray  # raw test outputs
    test_pred: np.ndarray  # denormalized predictions on the test split


def train_profile_mlp(inputs_raw: np.ndarray, outputs_raw: np.ndarray, cfg: MLPTrainConfig) -> MLPTrainResult:
    """Train in -> 800 profile MLP; returns params + scaler + histories."""
    inputs_raw = np.asarray(inputs_raw, np.float32)
    outputs_raw = np.asarray(outputs_raw, np.float32)
    n, d = inputs_raw.shape
    out_min = float(outputs_raw.min())
    out_max = float(outputs_raw.max())

    x = np.asarray(mlp_mod.normalize_inputs(inputs_raw, cfg.input_scale), np.float32)
    y = (outputs_raw - out_min) / (out_max - out_min)

    x_tr, x_tmp, y_tr, y_tmp = train_test_split(
        x, y, test_size=0.2, random_state=cfg.split_seed
    )
    x_va, x_te, y_va, y_te = train_test_split(
        x_tmp, y_tmp, test_size=0.5, random_state=cfg.split_seed
    )

    model, params = mlp_mod.init_params(cfg.init_seed, d, outputs_raw.shape[1])
    schedule = step_lr(cfg.learning_rate, cfg.lr_step_epochs, cfg.lr_gamma)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)
    opt_state = opt.init(params)

    def loss_fn(p, xb, yb):
        pred = model.apply({"params": p}, xb)
        return jnp.mean((pred - yb) ** 2)

    @jax.jit
    def epoch_step(params, opt_state, xb_all, yb_all, lr):
        def one_batch(carry, batch):
            params, opt_state, total = carry
            xb, yb = batch
            loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, total + loss), None

        opt_state.hyperparams["learning_rate"] = lr
        (params, opt_state, total), _ = jax.lax.scan(
            one_batch, (params, opt_state, jnp.zeros(())), (xb_all, yb_all)
        )
        return params, opt_state, total / xb_all.shape[0]

    @jax.jit
    def eval_loss(params, xb, yb):
        return loss_fn(params, xb, yb)

    bs = cfg.batch_size
    n_train = len(x_tr)
    n_batches = n_train // bs
    rng = np.random.default_rng(cfg.shuffle_seed)
    hist_train, hist_valid = [], []
    x_va_j, y_va_j = jnp.asarray(x_va), jnp.asarray(y_va)

    for epoch in range(cfg.epochs):
        perm = rng.permutation(n_train)[: n_batches * bs]
        xb_all = jnp.asarray(x_tr[perm].reshape(n_batches, bs, d))
        yb_all = jnp.asarray(y_tr[perm].reshape(n_batches, bs, -1))
        params, opt_state, train_loss = epoch_step(
            params, opt_state, xb_all, yb_all, schedule(epoch)
        )
        valid_loss = eval_loss(params, x_va_j, y_va_j)
        hist_train.append(float(train_loss))
        hist_valid.append(float(valid_loss))

    pred_norm = np.asarray(model.apply({"params": params}, jnp.asarray(x_te)))
    lo = np.asarray(cfg.input_scale[0])
    hi = np.asarray(cfg.input_scale[1])
    return MLPTrainResult(
        model=model,
        params=params,
        out_min=out_min,
        out_max=out_max,
        history_train=hist_train,
        history_valid=hist_valid,
        test_inputs=x_te * (hi - lo) + lo,
        test_outputs=y_te * (out_max - out_min) + out_min,
        test_pred=pred_norm * (out_max - out_min) + out_min,
    )
