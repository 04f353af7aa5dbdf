"""End-to-end pipeline stage tests on a tiny JetSurf sweep (CPU)."""

import os

import numpy as np
import pytest

from hexpyro.pipeline import artifacts
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.pipeline import stages


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    # n_cases >= 10 so the reference 80/10/10 split produces nonempty sets
    return PipelineConfig(
        mechanism="JetSurf", n_cases=16, n_steps=6, chunk_size=8,
        out_root=root, epochs=2, batch_size=4,
    )


class TestStages:
    def test_sample_simulate_train_deploy(self, tiny_cfg):
        cfg = tiny_cfg
        csv = stages.stage_sample(cfg)
        assert os.path.exists(csv)
        assert os.path.exists(f"{cfg.out_root}/figures/sampling_2D.png")

        paths = stages.stage_simulate(cfg, verbose=False)
        assert len(paths) == 16
        d = artifacts.read_trajectory_txt(paths[0])
        assert d["C"].shape == (7, 9)
        assert np.all(np.diff(d["t"]) > 0)

        npz = stages.stage_train_crnn(cfg)
        assert os.path.exists(npz)
        w_in, w_b, w_out = artifacts.load_crnn_parameters(npz)
        assert w_in.shape == (11, 9) and w_out.shape == (9, 9)

        mlp_dir = stages.stage_train_profile_mlp(cfg, "time")
        assert os.path.exists(f"{mlp_dir}/weights_JetSurf_4D_time_off.npz")

        out_csv = stages.stage_deploy(cfg, npz, mlp_dir)
        assert os.path.exists(out_csv)
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert len(df) == 16 * 7  # cases x species
        assert np.isfinite(df["RMSE_time_avg"]).all()


class TestEonSubstitution:
    def test_substitute_temp_profiles(self):
        from hexpyro.surrogate import mlp as mlp_mod
        from hexpyro.training.crnn_trainer import CRNNDataset, substitute_temp_profiles

        n_exp, ntotal = 4, 11
        rng = np.random.default_rng(0)
        ds = CRNNDataset(
            tsteps=np.linspace(0, 0.3, ntotal)[None].repeat(n_exp, 0),
            ylabel=rng.random((n_exp, 9, ntotal)),
            Tlist=rng.uniform(900, 1100, (n_exp, ntotal)),
            Plist=np.full((n_exp, ntotal), 2e5),
            u0=rng.random((n_exp, 9)),
            yscale=np.ones((n_exp, 9)),
        )
        _, params = mlp_mod.init_params(0, 2, ntotal - 1)
        ds2 = substitute_temp_profiles(ds, params, 900.0, 1100.0)
        # first column preserved (inlet T), remainder replaced by MLP output
        np.testing.assert_allclose(ds2.Tlist[:, 0], ds.Tlist[:, 0])
        assert ds2.Tlist.shape == ds.Tlist.shape
        assert not np.allclose(ds2.Tlist[:, 1:], ds.Tlist[:, 1:])
        # everything else untouched
        np.testing.assert_allclose(ds2.ylabel, ds.ylabel)
