"""Deployment + metric-suite tests, including an end-to-end run of the
reference's own trained artifacts (CRNN npz + time-MLP pth/pkl) through our
TPU-native deployment path."""

import numpy as np
import jax.numpy as jnp
import pytest

from hexpyro.evalsuite import metrics
from hexpyro.pipeline import artifacts
from hexpyro.surrogate import crnn, deploy, mlp

REF = "/root/reference"


class TestHelpers:
    def test_enforce_strict_matches_sequential(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            t = np.sort(rng.random(50)).astype(np.float64)
            # inject violations
            t[10] = t[9] - 0.01
            t[20:23] = t[19]
            expected = t.copy()
            for i in range(1, len(expected)):
                if expected[i] <= expected[i - 1]:
                    expected[i] = expected[i - 1] + 1e-5
            ours = np.asarray(deploy.enforce_strict(jnp.asarray(t)))
            np.testing.assert_allclose(ours, expected, rtol=0, atol=1e-12)
            assert np.all(np.diff(ours) > 0)

    def test_initial_concentrations(self):
        T0, P0 = 1000.0, 2.0e5
        c = deploy.initial_concentrations(jnp.array([T0]), jnp.array([P0]))
        expected = (P0 / (8.314462618 * T0)) / (0.7 * (86.178 / 18.015) + 1.0)
        assert np.isclose(float(c[0, deploy.HEXANE_SLOT]), expected, rtol=1e-4)
        assert float(jnp.count_nonzero(c)) == 1

    def test_unique_conditions_roundtrip(self):
        rng = np.random.default_rng(3)
        uniq_rows = rng.uniform([870, 1e5], [1150, 3e5], (5, 2))
        inv_true = rng.integers(0, 5, 17)
        T0, P0 = uniq_rows[inv_true, 0], uniq_rows[inv_true, 1]
        uniq, inv = deploy.unique_conditions(T0, P0)
        assert uniq.shape[0] == 5
        np.testing.assert_allclose(uniq[inv, 0], T0)
        np.testing.assert_allclose(uniq[inv, 1], P0)

    def test_resample_nearest(self):
        t_ref = np.array([0.0, 1.0, 2.0, 3.0])
        y = np.array([[10.0, 11.0, 12.0, 13.0]])
        out = deploy.resample_nearest(t_ref, y, np.array([0.1, 1.6, 2.9]))
        np.testing.assert_array_equal(out, [[10.0, 12.0, 13.0]])


class TestMetrics:
    def test_perfect_prediction_zero_error(self):
        y = np.linspace(1.0, 2.0, 11)
        m = metrics.trajectory_metrics(y, y)
        for k in ("RMSE_final", "RMSE_time_avg", "FCD", "Max_Norm"):
            assert m[k] == 0.0

    def test_known_offset(self):
        y = np.linspace(1.0, 2.0, 101)
        m = metrics.trajectory_metrics(y, y + 0.1)
        assert np.isclose(m["RMSE_final"], 0.1)
        assert np.isclose(m["RMSE_time_avg"], 0.1)
        assert np.isclose(m["FCD"], 0.1)  # mean shift, same std
        span = y[1:].max() - y[1:].min() + 1e-5
        assert np.isclose(m["NRMSE_time_avg"], 0.1 / span)

    def test_metric_table_layout(self):
        Y = np.abs(np.random.default_rng(0).random((2, 7, 11))) + 0.1
        df = metrics.metric_table(
            Y, Y * 1.01, ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H8-1", "NC6H14"],
            np.tile([1000.0, 2e5, 1.0, 2.5], (2, 1)),
        )
        assert list(df.columns) == metrics.METRIC_COLUMNS
        assert len(df) == 14

    def test_r2_and_mlp_stats(self):
        y = np.random.default_rng(1).random((5, 20)) + 1.0
        assert metrics.r2_score(y, y) == 1.0
        stats = metrics.per_case_stats(y, y + 0.01)
        assert np.allclose(stats["rmse"], 0.01)
        assert np.allclose(stats["mae"], 0.01)


class TestReferenceArtifactDeployment:
    """Drive the reference's trained LLNL Eoff artifacts through our deployment."""

    @pytest.fixture(scope="class")
    def model(self):
        w_in, w_b, w_out = artifacts.load_crnn_parameters(
            f"{REF}/SURROGATE_MODEL_PARAMETER_CONTAINER/training_history_LLNL_Eoff_wide_v2.npz"
        )
        sd = artifacts.load_torch_mlp_state_dict(
            f"{REF}/TIME_PRED_MODEL_PARAMETER_CONTAINER/mlp_weights_LLNL_4D_time_off.pth"
        )
        lo, hi = artifacts.load_minmax_scaler(
            f"{REF}/TIME_PRED_MODEL_PARAMETER_CONTAINER/min_max_values_mlp_LLNL_4D_time_off.pkl"
        )
        time_model = deploy.ProfileModel(
            params=mlp.load_torch_weights(sd),
            out_min=lo,
            out_max=hi,
            input_scale=mlp.INPUT_SCALE_4D_PA,
        )
        cfg = crnn.config_for("LLNL", variant="wide")
        return deploy.SurrogateModel(
            w_in=w_in, w_b=w_b, w_out=w_out, cfg=cfg, time_model=time_model
        )

    def test_eoff_deployment(self, model):
        T0 = jnp.array([950.0, 1050.0, 1140.0])
        P0 = jnp.array([1.5e5, 2.0e5, 2.5e5])
        L = jnp.array([0.8, 1.0, 0.6])
        u0 = jnp.array([3.0, 2.5, 4.0])
        tgrid, species = model.predict_eoff(T0, P0, L, u0)
        assert tgrid.shape == (3, 801) and species.shape == (3, 7, 801)
        assert bool(jnp.all(jnp.isfinite(species)))
        assert bool(jnp.all(jnp.diff(tgrid, axis=1) > 0))
        # time grid magnitudes: within the reference scaler's range
        assert float(tgrid[:, -1].min()) > 1e-3
        assert float(tgrid[:, -1].max()) < 1.0
        # initial rows zeroed except hexane
        assert np.allclose(np.asarray(species[:, :6, 0]), 0.0)
        hex0 = np.asarray(species[:, 6, 0])
        expected0 = np.asarray(deploy.initial_concentrations(T0, P0))[:, deploy.HEXANE_SLOT]
        np.testing.assert_allclose(hex0, expected0, rtol=1e-5)
        # hexane is consumed; products are formed at the hot condition
        hex_traj = np.asarray(species[2, 6, :])
        assert hex_traj[-1] < hex_traj[0] * 0.9
        assert float(species[2, 2, -1]) > 0.0  # C2H4

    def test_metric_suite_runs_on_deployment(self, model):
        T0 = jnp.array([1000.0])
        P0 = jnp.array([2.0e5])
        tgrid, species = model.predict_eoff(T0, P0, jnp.array([1.0]), jnp.array([2.5]))
        Y = np.asarray(species)
        df = metrics.metric_table(
            Y, Y, ["H2", "CH4", "C2H4", "C2H6", "C3H6", "C4H8-1", "NC6H14"],
            np.array([[1000.0, 2e5, 1.0, 2.5]]),
        )
        assert (df["RMSE_time_avg"] == 0).all()
