"""Full-batch L-BFGS polish (round-3 addition on top of reference parity).

polish_crnn is the finishing move for the deepest Eon anchors: after
plateau-AdamW stalls, a quasi-Newton pass on the full train loss keeps
descending. These tests check the contract on a small synthetic problem:
the polish reduces the loss, never returns a worse point than its input,
and the saved history stays consumer-compatible (parameters[-1]).
"""

import numpy as np

from hexpyro.pipeline import artifacts
from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training.crnn_trainer import (
    CRNNDataset,
    CRNNTrainConfig,
    make_splits,
    polish_crnn,
    predict_batch,
)

import jax.numpy as jnp


def _synthetic_dataset(n_exp=20, ntotal=15, seed=3):
    cfg = config_for("JetSurf")
    p_true = jnp.asarray(init_parameters(11, cfg))
    rng = np.random.default_rng(seed)
    T0 = rng.uniform(950, 1100, n_exp)
    tsteps = np.linspace(0.0, 0.25, ntotal)[None, :].repeat(n_exp, 0)
    Tlist = T0[:, None].repeat(ntotal, 1)
    u0 = np.zeros((n_exp, 9))
    u0[:, 6] = rng.uniform(15.0, 25.0, n_exp)
    sol = predict_batch(
        p_true, cfg, jnp.asarray(tsteps), jnp.asarray(Tlist), jnp.asarray(u0),
        rtol=1e-6, atol=1e-8,
    )
    ylabel = np.swapaxes(np.asarray(sol), 1, 2)
    ds = CRNNDataset(
        tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
        Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
        yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
    )
    return cfg, ds


def test_polish_descends_and_saves(tmp_path):
    cfg, ds = _synthetic_dataset()
    tcfg = CRNNTrainConfig(max_steps_per_interval=4)
    p0 = init_parameters(4, cfg)  # different seed: nonzero starting loss
    save = str(tmp_path / "history.npz")
    p, tr, va, info = polish_crnn(
        p0, ds, cfg, tcfg, maxiter=8, eval_chunk=8, save_path=save,
        verbose=False,
    )
    # baseline losses at p0 via the same definitions
    from hexpyro.training.crnn_trainer import batch_loss
    tr_idx, va_idx, _ = make_splits(ds.tsteps.shape[0], tcfg.split_seed)
    sel = np.asarray(tr_idx)[: (len(tr_idx) // 8) * 8]
    base = float(batch_loss(
        jnp.asarray(p0, jnp.float32), cfg,
        jnp.asarray(ds.tsteps[sel]), jnp.asarray(ds.Tlist[sel]),
        jnp.asarray(ds.u0[sel]), jnp.asarray(ds.ylabel[sel]),
        jnp.asarray(ds.yscale[sel]), tcfg,
    ))
    assert tr < base  # descended
    assert info["n_evals"] >= 1
    # saved history is consumer-compatible: one appended entry, final params
    train_l, valid_l = artifacts.load_crnn_history_losses(save)
    assert len(train_l) == 1 and train_l[-1] == tr and valid_l[-1] == va
    w_in, w_b, w_out = artifacts.load_crnn_parameters(save)
    assert w_in.shape == (11, 9) and w_out.shape == (9, 9)


def test_adam_param_scale_from_sidecar(tmp_path):
    from hexpyro.training.crnn_trainer import adam_param_scale, train_crnn

    cfg, ds = _synthetic_dataset()
    save = str(tmp_path / "h.npz")
    tcfg = CRNNTrainConfig(epochs=1, batch_size=8, max_steps_per_interval=2,
                           save_path=save, save_every=1)
    train_crnn(init_parameters(0, cfg), ds, cfg, tcfg, verbose=False)
    s = adam_param_scale(save + ".state.npz")
    assert s is not None and s.shape == (189,)
    assert (s > 0).all() and np.isfinite(s).all()
    assert abs(np.median(s) - 1.0) < 1e-6  # normalized to median 1
    # preconditioned polish still descends
    p, tr, va, info = polish_crnn(
        init_parameters(4, cfg), ds, cfg,
        CRNNTrainConfig(max_steps_per_interval=4),
        maxiter=4, eval_chunk=8, param_scale=s, verbose=False,
    )
    assert np.isfinite(tr) and np.isfinite(va)


def test_polish_early_stop_on_targets(tmp_path):
    cfg, ds = _synthetic_dataset()
    tcfg = CRNNTrainConfig(max_steps_per_interval=4)
    p0 = init_parameters(4, cfg)
    # targets far above the starting loss: the first callback must stop it
    p, tr, va, info = polish_crnn(
        p0, ds, cfg, tcfg, maxiter=50, eval_chunk=8,
        stop_train=1e3, stop_valid=1e3, verbose=False,
    )
    assert info["status"] == "target reached"
    assert info["n_evals"] <= 10  # stopped on the first accepted iterate


def test_eval_crnn_f32_matches_batch_loss():
    from hexpyro.training.crnn_trainer import batch_loss, eval_crnn_f32

    cfg, ds = _synthetic_dataset()
    tcfg = CRNNTrainConfig(max_steps_per_interval=4)
    p0 = init_parameters(4, cfg)
    tr, va = eval_crnn_f32(p0, ds, cfg, tcfg)
    tr_idx, va_idx, _ = make_splits(ds.tsteps.shape[0], tcfg.split_seed)
    for got, idx in ((tr, tr_idx), (va, va_idx)):
        sel = np.asarray(idx)
        want = float(batch_loss(
            jnp.asarray(p0, jnp.float32), cfg,
            jnp.asarray(ds.tsteps[sel], jnp.float32),
            jnp.asarray(ds.Tlist[sel], jnp.float32),
            jnp.asarray(ds.u0[sel], jnp.float32),
            jnp.asarray(ds.ylabel[sel], jnp.float32),
            jnp.asarray(ds.yscale[sel], jnp.float32), tcfg,
        ))
        assert np.isfinite(got)
        np.testing.assert_allclose(got, want, rtol=1e-6)
