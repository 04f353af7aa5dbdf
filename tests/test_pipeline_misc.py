"""Plots, parallel mesh, config/CLI, native IO, sampling tests."""

import os

import numpy as np
import pytest

from hexpyro.evalsuite import plots
from hexpyro.pipeline import artifacts, native
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.sampling import lhs


class TestPlots:
    def test_trajectory_figure(self):
        t = np.linspace(0, 0.4, 30)
        y = np.abs(np.random.default_rng(0).random((7, 30))) + 0.1
        fig = plots.plot_trajectories(t, y, y * 1.05, 1000.0, 2e5)
        assert len(fig.axes) == 9
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_two_model_figure(self):
        t = np.linspace(0, 0.4, 20)
        ys = [np.random.default_rng(i).random((7, 20)) for i in range(3)]
        fig = plots.plot_two_model_comparison(
            [t] * 3, ys, [t] * 3, ys, [(1000.0, 2e5), (1050.0, 2e5), (1100.0, 2e5)],
            model_names=("LLNL", "NUIG"),
        )
        assert len(fig.axes) == 9
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_two_model_figure_with_truth_scatter(self):
        """Truth overlays (reference :308-318): scattered points must appear."""
        t = np.linspace(0, 0.4, 20)
        ys = [np.random.default_rng(i).random((7, 20)) for i in range(3)]
        refs = [y * 1.02 for y in ys]
        fig = plots.plot_two_model_comparison(
            [t] * 3, ys, [t] * 3, ys, [(1000.0, 2e5), (1050.0, 2e5), (1100.0, 2e5)],
            model_names=("LLNL", "NUIG"), y_ref_a=refs, y_ref_b=refs, ref_sparsity=4,
        )
        # each species axis: 6 lines + 6 scatter collections (3 conds x 2 models)
        assert len(fig.axes[0].collections) == 6
        import matplotlib.pyplot as plt

        plt.close(fig)

    def test_parity_residual_hist_corner(self):
        import matplotlib.pyplot as plt

        rng = np.random.default_rng(0)
        y = rng.random((10, 50)) + 1
        for fig in (
            plots.parity_plot(y, y * 1.01),
            plots.residual_plot(y, y * 1.01),
            plots.error_histograms(y, y * 1.01),
            plots.sampling_corner_plot(rng.random((100, 2)) * [280, 2] + [870, 1]),
        ):
            plt.close(fig)


class TestParallelMesh:
    def test_sharded_pfr_smoke(self, toy_or_skip=None):
        """PFR sweep with the case axis sharded over the 8-device CPU mesh."""
        import jax
        import jax.numpy as jnp

        from hexpyro.mechanism import load_mechanism, to_device_arrays
        from hexpyro.parallel.mesh import case_sharding, make_mesh, shard_cases
        from hexpyro.reactors.pfr import simulate_pfr

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mech = load_mechanism(os.path.join(os.path.dirname(__file__), "data", "toy.yaml"))
        arr = to_device_arrays(mech)
        mesh = make_mesh(8)
        B = 16
        T0 = jnp.linspace(900.0, 1100.0, B)
        P0 = jnp.full((B,), 1e5)
        T0s, P0s = shard_cases((T0, P0), mesh)
        fn = jax.jit(
            lambda T0, P0: simulate_pfr(
                arr, T0, P0, Y_feed=jnp.array([1.0, 0.0, 0.0]), n_steps=10
            ),
            in_shardings=(case_sharding(mesh),) * 2,
        )
        traj = fn(T0s, P0s)
        assert bool(traj.converged.all())
        assert traj.Y.shape == (B, 11, 3)
        # results identical to the unsharded run
        traj_ref = jax.jit(
            lambda T0, P0: simulate_pfr(
                arr, T0, P0, Y_feed=jnp.array([1.0, 0.0, 0.0]), n_steps=10
            )
        )(T0, P0)
        np.testing.assert_allclose(
            np.asarray(traj.Y), np.asarray(traj_ref.Y), rtol=1e-12
        )

    def test_pad_to_multiple(self):
        from hexpyro.parallel.mesh import pad_to_multiple

        a = np.arange(10.0)[:, None]
        p, n = pad_to_multiple(a, 8)
        assert p.shape == (16, 1) and n == 10
        assert (p[10:] == a[-1]).all()


class TestConfig:
    def test_defaults_and_overrides(self):
        cfg = PipelineConfig().with_overrides(mechanism="LLNL", n_cases=32)
        assert cfg.mechanism == "LLNL" and cfg.n_cases == 32
        assert cfg.mode == "Eoff"
        assert "2D_off" in cfg.dataset_dir

    def test_toml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.toml"
        p.write_text('mechanism = "NUIGMech1.1"\nenergy_on = true\nn_cases = 12\n')
        cfg = PipelineConfig.from_toml(str(p), n_steps=50)
        assert cfg.mechanism == "NUIGMech1.1"
        assert cfg.energy_on and cfg.n_cases == 12 and cfg.n_steps == 50
        assert cfg.mode == "Eon"

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "bad.toml"
        p.write_text("nonsense = 1\n")
        with pytest.raises(ValueError, match="unknown config keys"):
            PipelineConfig.from_toml(str(p))

    def test_cli_parses(self):
        from hexpyro import cli

        parser_ok = True
        try:
            cli.main(["sample", "--mechanism", "JetSurf", "--n-cases", "4",
                      "--out-root", "/tmp/hexpyro_cli_test"])
        except SystemExit:
            parser_ok = False
        assert parser_ok
        assert os.path.exists("/tmp/hexpyro_cli_test/sampling_case_2D.csv")


class TestNativeIO:
    def test_roundtrip_exact(self, tmp_path):
        if not native.available():
            pytest.skip("native lib not built")
        m = np.random.default_rng(0).random((31, 14)) * np.logspace(-18, 4, 14)
        p = str(tmp_path / "m.txt")
        assert native.write_matrix(p, m)
        r = native.read_matrix(p)
        np.testing.assert_array_equal(r, m)  # %.18e roundtrips f64 exactly
        # numpy can read what native writes and vice versa
        np.testing.assert_allclose(np.loadtxt(p), m)
        np.savetxt(p, m)
        np.testing.assert_allclose(native.read_matrix(p), m)


class TestSampling:
    def test_reference_bounds_and_shape(self):
        s = lhs.sample_2d(100, seed=2024)
        assert s.shape == (100, 2)
        assert s[:, 0].min() >= 870 and s[:, 0].max() <= 1150
        assert s[:, 1].min() >= 1.0 and s[:, 1].max() <= 3.0

    def test_4d_bounds(self):
        s = lhs.sample_4d(50)
        assert s.shape == (50, 4)
        assert s[:, 2].min() >= 0.5 and s[:, 3].max() <= 5.0

    def test_lhs_stratification(self):
        """Each of n equal bins contains exactly one sample per dimension."""
        n = 64
        s = lhs.sample_2d(n, seed=1)
        for d, (lo, hi) in enumerate([(870.0, 1150.0), (1.0, 3.0)]):
            bins = ((s[:, d] - lo) / (hi - lo) * n).astype(int)
            assert len(np.unique(bins)) == n

    def test_csv_roundtrip(self, tmp_path):
        s = lhs.sample_2d(10)
        p = str(tmp_path / "cases.csv")
        lhs.write_cases_csv(p, s)
        r = lhs.read_cases_csv(p)
        np.testing.assert_allclose(r, s)
