"""Temperature-profile and time-grid MLPs (flax).

Architecture mirrors the reference exactly: in -> 512 -> 512 -> 512 -> 800 with
ReLU (TEMP_PRED_MODEL_TRAINING/temp_profile_model_training_2D.py:116-135,
SURROGATE_MODEL/surrogate_model_Eoff_single_model.py:192-208): the temp model
takes min-max-normalized (T0, P0), the time model (T0, P0, L, u0), both predict
the 800 post-inlet grid values, min-max normalized by a scalar (min, max) pair.

`load_torch_weights` maps the reference's .pth state_dicts into flax params
(kernel = weight^T), enabling golden tests against the checked-in
TEMP/TIME_PRED_MODEL_PARAMETER_CONTAINER artifacts and letting users deploy the
reference's trained models unchanged on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

HIDDEN = 512
OUTPUT_NODE = 800

# fixed input normalization ranges (temp_profile_model_training_2D.py:38-39 and
# surrogate_model_Eoff_single_model.py:282-283). Pressure is in BAR in the
# sampling CSVs (training) and in PA inside deployment; both scale pairs map
# the same physical pressure to the same normalized value, so a model trained
# with a bar scale MUST be queried with the _PA scale when the raw input is Pa
# (reference deploys with [1e5, 3e5]: surrogate_model_Eon_single_model.py:282).
INPUT_SCALE_2D = np.array([[870.0, 1.0], [1150.0, 3.0]])
INPUT_SCALE_2D_PA = np.array([[870.0, 1.0e5], [1150.0, 3.0e5]])
INPUT_SCALE_4D = np.array([[870.0, 1.0, 0.5, 2.5], [1150.0, 3.0, 1.0, 5.0]])
INPUT_SCALE_4D_PA = np.array([[870.0, 1.0e5, 0.5, 2.5], [1150.0, 3.0e5, 1.0, 5.0]])


class ProfileMLP(nn.Module):
    """in -> 512 -> 512 -> 512 -> out, ReLU; named fc1..fc4 like the reference."""

    output_node: int = OUTPUT_NODE
    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc3")(x))
        return nn.Dense(self.output_node, name="fc4")(x)


def init_params(rng_seed: int, input_node: int, output_node: int = OUTPUT_NODE, dtype=jnp.float32):
    model = ProfileMLP(output_node=output_node)
    params = model.init(
        jax.random.PRNGKey(rng_seed), jnp.zeros((1, input_node), dtype)
    )["params"]
    return model, params


def apply(model: ProfileMLP, params, x):
    return model.apply({"params": params}, x)


def normalize_inputs(x, input_scale):
    """Min-max normalize raw inputs column-wise: (x - lo) / (hi - lo)."""
    lo, hi = jnp.asarray(input_scale[0]), jnp.asarray(input_scale[1])
    return (x - lo) / (hi - lo)


def denormalize_outputs(y, min_val, max_val):
    return y * (max_val - min_val) + min_val


def normalize_outputs(y, min_val, max_val):
    return (y - min_val) / (max_val - min_val)


def load_torch_weights(state_dict: dict, dtype=jnp.float32):
    """Reference .pth state_dict (numpy) -> flax params for ProfileMLP."""
    params = {}
    for i in (1, 2, 3, 4):
        params[f"fc{i}"] = {
            "kernel": jnp.asarray(state_dict[f"fc{i}.weight"].T, dtype),
            "bias": jnp.asarray(state_dict[f"fc{i}.bias"], dtype),
        }
    return params
