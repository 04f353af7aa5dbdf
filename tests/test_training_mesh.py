"""Multi-device data-parallel CRNN training (VERDICT r2 item 5).

Under the 8-device virtual CPU mesh (conftest), train_crnn shards the batch
axis over the devices with parameters replicated. The update is a pure
placement change, so the loss curve must reproduce the single-device run at
equal global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training.crnn_trainer import (
    CRNNDataset,
    CRNNTrainConfig,
    predict_batch,
    train_crnn,
)


def _synthetic_dataset(n_exp=24, ntotal=21, seed=5):
    cfg = config_for("LLNL")
    p_true = jnp.asarray(init_parameters(7, cfg))
    rng = np.random.default_rng(seed)
    T0 = rng.uniform(950, 1100, n_exp)
    tsteps = np.linspace(0.0, 0.3, ntotal)[None, :].repeat(n_exp, 0)
    Tlist = T0[:, None].repeat(ntotal, 1)
    u0 = np.zeros((n_exp, 9))
    u0[:, 6] = rng.uniform(15.0, 25.0, n_exp)
    sol = predict_batch(
        p_true, cfg, jnp.asarray(tsteps), jnp.asarray(Tlist), jnp.asarray(u0),
        rtol=1e-6, atol=1e-8,
    )
    ylabel = np.swapaxes(np.asarray(sol), 1, 2)
    return cfg, CRNNDataset(
        tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
        Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
        yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
    )


def test_mesh_training_matches_single_device():
    """Sharded vs single-device loss curves agree at equal global batch.

    Two epochs at f64: long horizons drift apart through reduction-order
    float reassociation amplified by the stiff ODE (measured: identical to 8
    digits for 2 epochs, ~2% by epoch 3), so the equivalence window is where
    bit-level agreement is meaningful. A semantics bug (per-shard mean, missing
    psum) would be off by O(n_devices) immediately.
    """
    assert jax.device_count() == 8, "conftest should provide 8 virtual devices"
    cfg, ds = _synthetic_dataset()
    p0 = init_parameters(2, cfg)
    kw = dict(epochs=2, batch_size=8, learning_rate=2e-3, dtype="f64")
    _, hist_mesh = train_crnn(
        p0, ds, cfg, CRNNTrainConfig(use_mesh=True, **kw), verbose=False
    )
    _, hist_single = train_crnn(
        p0, ds, cfg, CRNNTrainConfig(use_mesh=False, **kw), verbose=False
    )
    np.testing.assert_allclose(
        hist_mesh["train_loss"], hist_single["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        hist_mesh["valid_loss"], hist_single["valid_loss"], rtol=1e-6
    )
    # the mesh run's converted parameters stay finite and in-bounds
    w_in, w_b, w_out = (hist_mesh["parameters"][-1][k] for k in ("w_in", "w_b", "w_out"))
    assert np.isfinite(w_in).all() and np.isfinite(w_b).all() and np.isfinite(w_out).all()
