"""Learning-rate schedules matching the reference's torch schedulers.

* StepLR(step_size, gamma) (temp_profile_model_training_2D.py:144) ->
  staircase exponential decay keyed on epoch count.
* ReduceLROnPlateau(factor, patience, threshold, 'rel')
  (Eoff_surrogate_model_training.py:515) -> a small pure-pytree controller
  stepped once per epoch with the validation loss; it returns a multiplicative
  lr scale that composes with optax.scale_by_learning_rate via inject_hyperparams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def step_lr(init_lr: float, step_size_epochs: int, gamma: float):
    """Callable epoch -> lr replicating torch StepLR."""

    def schedule(epoch: int) -> float:
        return init_lr * gamma ** (epoch // step_size_epochs)

    return schedule


class PlateauState(NamedTuple):
    best: jnp.ndarray  # best validation loss seen
    num_bad: jnp.ndarray  # epochs since last improvement
    scale: jnp.ndarray  # current multiplicative lr factor


def plateau_init(dtype=jnp.float32) -> PlateauState:
    return PlateauState(
        best=jnp.asarray(jnp.inf, dtype),
        num_bad=jnp.asarray(0, jnp.int32),
        scale=jnp.asarray(1.0, dtype),
    )


def plateau_step(
    state: PlateauState,
    valid_loss,
    factor: float = 0.6,
    patience: int = 5,
    threshold: float = 1e-4,
    min_scale: float = 1e-8,
) -> PlateauState:
    """One per-epoch update with torch's 'rel' threshold mode semantics."""
    improved = valid_loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, valid_loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    scale = jnp.where(reduce, jnp.maximum(state.scale * factor, min_scale), state.scale)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(best=best, num_bad=num_bad, scale=scale)
