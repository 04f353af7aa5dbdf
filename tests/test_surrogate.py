"""CRNN + MLP surrogate tests, anchored to the reference's checked-in artifacts.

Golden anchors:
  * training_history_NUIG_Eon.npz / training_history_LLNL_Eoff_wide.npz carry
    both the raw parameter vector `updated_p` and the converted
    `final_parameters` -- applying OUR parameter transform to their raw vector
    must reproduce their converted weights (validates every clamp/slope/
    projection constant);
  * mlp_weights_*.pth loaded into the flax ProfileMLP must agree with a direct
    numpy forward pass of the torch state_dict.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hexpyro.pipeline import artifacts
from hexpyro.surrogate import crnn, mlp

REF = "/root/reference"


class TestParameterConverter:
    def test_golden_nuig_eon(self):
        z = np.load(
            f"{REF}/SURROGATE_MODEL_PARAMETER_CONTAINER/training_history_NUIG_Eon.npz",
            allow_pickle=True,
        )
        p = np.asarray(z["updated_p"], np.float64)
        final = z["final_parameters"].item()
        cfg = crnn.config_for("NUIG", energy_on=True)
        w_in, w_b, w_out = crnn.parameter_converter(jnp.asarray(p), cfg)
        np.testing.assert_allclose(np.asarray(w_b), final["w_b"], rtol=2e-5)
        np.testing.assert_allclose(np.asarray(w_out), final["w_out"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(w_in), final["w_in"], atol=2e-5)

    def test_golden_llnl_wide(self):
        z = np.load(
            f"{REF}/SURROGATE_MODEL_PARAMETER_CONTAINER/training_history_LLNL_Eoff_wide.npz",
            allow_pickle=True,
        )
        p = np.asarray(z["updated_p"], np.float64)
        final = z["final_parameters"].item()
        cfg = crnn.config_for("LLNL", variant="wide")
        w_in, w_b, w_out = crnn.parameter_converter(jnp.asarray(p), cfg)
        np.testing.assert_allclose(np.asarray(w_b), final["w_b"], rtol=2e-5)
        np.testing.assert_allclose(np.asarray(w_out), final["w_out"], atol=2e-5)
        np.testing.assert_allclose(np.asarray(w_in), final["w_in"], atol=2e-5)

    def test_element_conservation(self):
        cfg = crnn.config_for("LLNL")
        p = jnp.asarray(crnn.init_parameters(0, cfg))
        _, _, w_out = crnn.parameter_converter(p, cfg)
        resid = crnn.element_balance_residual(w_out)
        # the projection is regularized (eps=1e-4), not exact: small residual
        assert float(jnp.abs(resid).max()) < 5e-3

    def test_init_first_neuron_matches_seed_fit(self):
        cfg = crnn.config_for("JetSurf")
        p = jnp.asarray(crnn.init_parameters(3, cfg))
        w_in, w_b, w_out = crnn.parameter_converter(p, cfg)
        assert np.isclose(float(w_b[0]), cfg.a_fit, rtol=1e-6)
        assert np.isclose(float(w_in[-1, 0]), cfg.b_fit, rtol=1e-6)  # b slot
        assert np.isclose(float(w_in[-2, 0]), cfg.ea_fit, rtol=1e-6)  # Ea slot
        # anchored first column: hexane slot is -1 (pre-clamp value projects to itself)
        assert float(w_out[6, 0]) < -0.5

    def test_rhs_finite_and_shapes(self):
        cfg = crnn.config_for("LLNL")
        p = jnp.asarray(crnn.init_parameters(1, cfg))
        w_in, w_b, w_out = crnn.parameter_converter(p, cfg)
        u = jnp.abs(jnp.ones((4, 9)) * jnp.linspace(0.01, 5.0, 4)[:, None])
        du = crnn.crnn_rhs(u, jnp.full(4, 1000.0), w_in, w_b, w_out, cfg)
        assert du.shape == (4, 9)
        assert bool(jnp.all(jnp.isfinite(du)))
        assert bool(jnp.all(jnp.abs(du) <= cfg.du_clip))


class TestProfileMLPGolden:
    @pytest.mark.parametrize(
        "pth",
        [
            "TEMP_PRED_MODEL_PARAMETER_CONTAINER/mlp_weights_LLNL_2D.pth",
            "TIME_PRED_MODEL_PARAMETER_CONTAINER/mlp_weights_LLNL_4D_time_off.pth",
        ],
    )
    def test_reference_pth_forward(self, pth):
        sd = artifacts.load_torch_mlp_state_dict(f"{REF}/{pth}")
        d_in = sd["fc1.weight"].shape[1]
        params = mlp.load_torch_weights(sd, dtype=jnp.float64)
        model = mlp.ProfileMLP()
        x = np.linspace(0.1, 0.9, d_in * 3).reshape(3, d_in)
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        # independent numpy forward pass of the torch layout
        h = x
        for i in (1, 2, 3):
            h = np.maximum(h @ sd[f"fc{i}.weight"].T + sd[f"fc{i}.bias"], 0.0)
        expected = h @ sd["fc4.weight"].T + sd["fc4.bias"]
        np.testing.assert_allclose(ours, expected, rtol=1e-10)
        assert ours.shape == (3, 800)

    def test_scaler_roundtrip(self, tmp_path):
        p = str(tmp_path / "s.pkl")
        artifacts.save_minmax_scaler(p, 868.82, 1131.66)
        lo, hi = artifacts.load_minmax_scaler(p)
        assert (lo, hi) == (868.82, 1131.66)

    def test_reference_scaler_readable(self):
        lo, hi = artifacts.load_minmax_scaler(
            f"{REF}/TEMP_PRED_MODEL_PARAMETER_CONTAINER/min_max_values_mlp_LLNL_2D.pkl"
        )
        assert 860.0 < lo < 880.0 and 1120.0 < hi < 1140.0


class TestTrainers:
    def test_mlp_trainer_learns(self):
        from hexpyro.training.mlp_trainer import MLPTrainConfig, train_profile_mlp

        rng = np.random.default_rng(0)
        x = rng.uniform([870.0, 1.0], [1150.0, 3.0], size=(64, 2))
        # smooth target profile depending on inputs
        grid = np.linspace(0, 1, 800)
        y = x[:, :1] * (1 + 0.1 * np.sin(2 * np.pi * grid)[None, :]) + 10 * x[:, 1:]
        cfg = MLPTrainConfig(input_scale=mlp.INPUT_SCALE_2D, epochs=60, batch_size=16)
        res = train_profile_mlp(x, y, cfg)
        assert res.history_train[-1] < res.history_train[0] * 0.05
        rel = np.abs(res.test_pred - res.test_outputs) / np.abs(res.test_outputs)
        assert rel.mean() < 0.05

    def test_crnn_trainer_learns_synthetic(self):
        """Fit the CRNN to trajectories generated by a known CRNN instance."""
        from hexpyro.surrogate.crnn import config_for, init_parameters, parameter_converter
        from hexpyro.training.crnn_trainer import (
            CRNNDataset,
            CRNNTrainConfig,
            predict_batch,
            train_crnn,
        )

        cfg = config_for("LLNL")
        p_true = jnp.asarray(init_parameters(7, cfg))
        n_exp, ntotal = 16, 41
        rng = np.random.default_rng(1)
        T0 = rng.uniform(950, 1100, n_exp)
        tsteps = np.linspace(0.0, 0.3, ntotal)[None, :].repeat(n_exp, 0)
        Tlist = T0[:, None].repeat(ntotal, 1)
        u0 = np.zeros((n_exp, 9))
        u0[:, 6] = rng.uniform(15.0, 25.0, n_exp)  # hexane slot [mol/m^3]
        sol = predict_batch(
            p_true, cfg, jnp.asarray(tsteps), jnp.asarray(Tlist), jnp.asarray(u0),
            rtol=1e-6, atol=1e-8,
        )
        ylabel = np.swapaxes(np.asarray(sol), 1, 2)
        ds = CRNNDataset(
            tsteps=tsteps, ylabel=ylabel, Tlist=Tlist, Plist=np.full_like(Tlist, 2e5),
            u0=ylabel[:, :, 0],
            yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
        )
        p0 = init_parameters(2, cfg)  # different seed
        # f64: the CPU verification profile (f32 converges on the real flagship
        # data but takes a different, slower trajectory on this tiny synthetic)
        tcfg = CRNNTrainConfig(epochs=6, batch_size=4, learning_rate=2e-3, dtype="f64")
        p, hist = train_crnn(p0, ds, cfg, tcfg, verbose=False)
        assert hist["train_loss"][-1] < hist["train_loss"][0] * 0.7
        assert np.isfinite(hist["train_loss"]).all()
        assert len(hist["parameters"]) == 6

    def test_crnn_trainer_resume_full_state(self, tmp_path):
        """Interrupted training resumes with history append + exact lr state."""
        from hexpyro.surrogate.crnn import config_for, init_parameters
        from hexpyro.training.crnn_trainer import (
            CRNNDataset,
            CRNNTrainConfig,
            train_crnn,
        )

        cfg = config_for("LLNL")
        n_exp, ntotal = 8, 11
        rng = np.random.default_rng(3)
        tsteps = np.linspace(0.0, 0.2, ntotal)[None, :].repeat(n_exp, 0)
        Tlist = rng.uniform(950, 1100, n_exp)[:, None].repeat(ntotal, 1)
        ylabel = rng.uniform(0.1, 20.0, (n_exp, 9, ntotal))
        ds = CRNNDataset(
            tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
            Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
            yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
        )
        save = str(tmp_path / "hist.npz")
        base = dict(batch_size=4, learning_rate=2e-3, save_path=save,
                    save_every=1, plateau_patience=0, plateau_threshold=0.5)
        # phase 1: 3 epochs; patience 0 + huge threshold forces lr decay so the
        # resumed plateau scale is nontrivial
        train_crnn(init_parameters(1, cfg), ds, cfg,
                   CRNNTrainConfig(epochs=3, **base), verbose=False)
        assert (tmp_path / "hist.npz.state.npz").exists()
        # phase 2: resume to 5 epochs -- history must append, not restart
        p, hist = train_crnn(init_parameters(9, cfg), ds, cfg,
                             CRNNTrainConfig(epochs=5, **base), verbose=False)
        assert len(hist["train_loss"]) == 5
        with np.load(save, allow_pickle=True) as z:
            assert len(z["train_loss"]) == 5
        # phase 2 with resume disabled restarts from scratch
        _, hist2 = train_crnn(
            init_parameters(9, cfg), ds, cfg,
            CRNNTrainConfig(epochs=2, resume=False, **base), verbose=False)
        assert len(hist2["train_loss"]) == 2

    def test_crnn_trainer_early_stop_valid_gate(self):
        """stop_at_valid_loss gates the early stop: train target alone is not
        enough when a valid target is also set."""
        from hexpyro.surrogate.crnn import config_for, init_parameters
        from hexpyro.training.crnn_trainer import (
            CRNNDataset,
            CRNNTrainConfig,
            train_crnn,
        )

        cfg = config_for("LLNL")
        n_exp, ntotal = 8, 11
        rng = np.random.default_rng(5)
        tsteps = np.linspace(0.0, 0.2, ntotal)[None, :].repeat(n_exp, 0)
        Tlist = rng.uniform(950, 1100, n_exp)[:, None].repeat(ntotal, 1)
        ylabel = rng.uniform(0.1, 20.0, (n_exp, 9, ntotal))
        ds = CRNNDataset(
            tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
            Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
            yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
        )
        base = dict(batch_size=4, learning_rate=2e-3)
        # train target trivially met, valid target unreachable -> no early stop
        _, hist = train_crnn(
            init_parameters(1, cfg), ds, cfg,
            CRNNTrainConfig(epochs=3, stop_at_train_loss=1e9,
                            stop_at_valid_loss=1e-12, **base), verbose=False)
        assert len(hist["train_loss"]) == 3
        # both targets trivially met -> stops after the first epoch
        _, hist = train_crnn(
            init_parameters(1, cfg), ds, cfg,
            CRNNTrainConfig(epochs=3, stop_at_train_loss=1e9,
                            stop_at_valid_loss=1e9, **base), verbose=False)
        assert len(hist["train_loss"]) == 1
        # no valid target (back-compat): train target alone stops
        _, hist = train_crnn(
            init_parameters(1, cfg), ds, cfg,
            CRNNTrainConfig(epochs=3, stop_at_train_loss=1e9, **base),
            verbose=False)
        assert len(hist["train_loss"]) == 1

    def test_crnn_trainer_resume_lr_scale_override(self, tmp_path):
        """resume_lr_scale replaces the replayed plateau scale on resume."""
        from hexpyro.surrogate.crnn import config_for, init_parameters
        from hexpyro.training.crnn_trainer import (
            CRNNDataset,
            CRNNTrainConfig,
            train_crnn,
        )

        cfg = config_for("LLNL")
        n_exp, ntotal = 8, 11
        rng = np.random.default_rng(6)
        tsteps = np.linspace(0.0, 0.2, ntotal)[None, :].repeat(n_exp, 0)
        Tlist = rng.uniform(950, 1100, n_exp)[:, None].repeat(ntotal, 1)
        ylabel = rng.uniform(0.1, 20.0, (n_exp, 9, ntotal))
        ds = CRNNDataset(
            tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
            Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
            yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
        )
        save = str(tmp_path / "hist.npz")
        # phase 1: collapse the plateau scale (patience 0, huge threshold)
        base = dict(batch_size=4, learning_rate=2e-3, save_path=save,
                    save_every=1, plateau_patience=0, plateau_threshold=0.5)
        train_crnn(init_parameters(1, cfg), ds, cfg,
                   CRNNTrainConfig(epochs=3, **base), verbose=False)
        # phase 2 resumes with the scale overridden to 0.25 -> first epoch
        # must report lr = learning_rate * 0.25, not the collapsed replay
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            train_crnn(init_parameters(9, cfg), ds, cfg,
                       CRNNTrainConfig(epochs=4, resume_lr_scale=0.25, **base),
                       verbose=True)
        out = buf.getvalue()
        assert "lr scale 0.25" in out
        assert "epoch 4/4" in out and "lr 5.00e-04" in out

    def test_crnn_trainer_resume_params_only(self, tmp_path):
        """A history npz without a sidecar resumes params + replayed plateau."""
        from hexpyro.surrogate.crnn import config_for, init_parameters
        from hexpyro.training.crnn_trainer import (
            CRNNDataset,
            CRNNTrainConfig,
            train_crnn,
        )

        cfg = config_for("LLNL")
        n_exp, ntotal = 8, 11
        rng = np.random.default_rng(4)
        tsteps = np.linspace(0.0, 0.2, ntotal)[None, :].repeat(n_exp, 0)
        Tlist = rng.uniform(950, 1100, n_exp)[:, None].repeat(ntotal, 1)
        ylabel = rng.uniform(0.1, 20.0, (n_exp, 9, ntotal))
        ds = CRNNDataset(
            tsteps=tsteps, ylabel=ylabel, Tlist=Tlist,
            Plist=np.full_like(Tlist, 2e5), u0=ylabel[:, :, 0],
            yscale=np.clip(ylabel.max(2) - ylabel.min(2), 1e-6, None),
        )
        save = str(tmp_path / "hist.npz")
        base = dict(batch_size=4, learning_rate=2e-3, save_path=save,
                    save_every=1)
        train_crnn(init_parameters(1, cfg), ds, cfg,
                   CRNNTrainConfig(epochs=2, **base), verbose=False)
        (tmp_path / "hist.npz.state.npz").unlink()  # legacy checkpoint
        _, hist = train_crnn(init_parameters(9, cfg), ds, cfg,
                             CRNNTrainConfig(epochs=4, **base), verbose=False)
        assert len(hist["train_loss"]) == 4
