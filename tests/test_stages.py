"""End-to-end pipeline stage tests on a tiny JetSurf sweep (CPU)."""

import dataclasses
import glob
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

        # per-case prediction txt in the reference layout (Eon model :359-369)
        preds = sorted(glob.glob(f"{cfg.out_root}/predictions_JetSurf_Eoff/*.txt"))
        assert len(preds) == 16
        mat = np.loadtxt(preds[0])
        assert mat.shape == (7, 5 + 7)  # [t, T, P, L, u0, C1..C7]

    @pytest.mark.slow  # two fresh jit compiles (f32 sweep + f64 rescue), ~5 min CPU
    def test_simulate_rescue_pass(self, tiny_cfg, monkeypatch):
        """Forcing the rescue threshold to ~0 sends every case through the f64
        re-solve; the rescued txt files must overwrite the f32 ones and the
        diagnostics must record the post-rescue quality."""
        cfg = dataclasses.replace(
            tiny_cfg, out_root=tiny_cfg.out_root + "/rescue", n_cases=4,
            chunk_size=4, dtype="f32", x64=False,
        )
        stages.stage_sample(cfg)
        monkeypatch.setenv("HEXPYRO_RESCUE_RESID", "1e-6")
        paths = stages.stage_simulate(cfg, verbose=False)
        assert len(paths) == 4
        diag = np.load(f"{cfg.dataset_dir}/solver_diagnostics.npz")
        # rescue re-solved every case at f64: residuals are at the f64
        # solver's converged level, far below the f32 stall floor
        assert diag["case_max_resid"].shape == (4,)
        assert np.all(diag["case_max_resid"] < 120.0)
        assert bool(np.all(diag["case_converged"]))
        d = artifacts.read_trajectory_txt(paths[0])
        assert np.all(np.diff(d["t"]) > 0)

        # force_f64_ids: with the threshold back at its default, a CONVERGED
        # case is still routed through the f64 rescue writer and its txt is
        # rewritten in place (same f64 solve, different lane composition)
        monkeypatch.setenv("HEXPYRO_RESCUE_RESID", "300")
        before = artifacts.read_trajectory_txt(paths[1])
        t0 = os.path.getmtime(paths[1])
        stages.stage_simulate(cfg, verbose=False, only_ids=np.array([1]),
                              force_f64_ids=np.array([1]))
        assert os.path.getmtime(paths[1]) > t0
        after = artifacts.read_trajectory_txt(paths[1])
        rel = np.abs(after["C"] - before["C"]) / np.maximum(
            np.abs(before["C"]).max(0), 1e-30)
        assert rel.max() < 1e-6

    def test_simulate_only_ids_subset(self, tiny_cfg):
        """Priority subset sweep: only the requested global case ids are
        written, under their global numbering, matching the full sweep's
        trajectories bit-for-bit (same cases CSV, same chunk shape)."""
        import shutil

        cfg = dataclasses.replace(tiny_cfg, out_root=tiny_cfg.out_root + "/subset")
        if not os.path.exists(tiny_cfg.cases_csv):
            stages.stage_sample(tiny_cfg)
            stages.stage_simulate(tiny_cfg, verbose=False)
        os.makedirs(cfg.out_root, exist_ok=True)
        shutil.copy(tiny_cfg.cases_csv, cfg.cases_csv)
        paths = stages.stage_simulate(cfg, verbose=False, only_ids=np.array([2, 5]))
        names = sorted(os.path.basename(p) for p in paths)
        assert names == ["JetSurf_Eoff_3.txt", "JetSurf_Eoff_6.txt"]
        assert sorted(os.listdir(cfg.dataset_dir)) == names
        cases = np.loadtxt(cfg.cases_csv, delimiter=",")
        for k, name in ((2, "JetSurf_Eoff_3.txt"), (5, "JetSurf_Eoff_6.txt")):
            got = artifacts.read_trajectory_txt(f"{cfg.dataset_dir}/{name}")
            # global-id mapping is the contract: the isothermal trajectory
            # carries its global case's exact (T0, P0)
            assert abs(got["T"][0] - cases[k, 0]) < 1e-2
            assert abs(got["P"][0] - cases[k, 1] * 1e5) < 1.0
            ref = artifacts.read_trajectory_txt(f"{tiny_cfg.dataset_dir}/{name}")
            # trajectory equivalence is only a gross-mismap guard: lane
            # composition differs between the full and subset batches, so
            # stall points and even the f64-rescue decision can differ on the
            # tiny config's extra-stiff segments (dz = L/6); a wrong case
            # would be O(1) off
            rel = np.abs(got["C"] - ref["C"]) / np.maximum(
                np.abs(ref["C"]).max(0), 1e-30)
            assert rel.max() < 5e-2, f"{name}: max rel-to-peak {rel.max():.3e}"
        # no solver_diagnostics for subset sweeps (indices would be partial)
        assert not os.path.exists(f"{cfg.dataset_dir}/solver_diagnostics.npz")

    def test_pick_validation_cases(self):
        rng = np.random.default_rng(7)
        cases = rng.uniform([900, 1], [1200, 5], (810, 2))
        for eon in (False, True):
            pick = stages.pick_validation_cases(cases, eon, "reference-valid")
            assert len(pick) == 3 and len(set(pick)) == 3
            assert all(isinstance(k, int) and 0 <= k < 810 for k in pick)
        # Eon picker is the reference's sorted-all 200/410/800 rule
        order = np.argsort(cases[:, 0])
        assert stages.pick_validation_cases(cases, True, "reference-valid") == \
            [int(order[200]), int(order[410]), int(order[800])]

    def test_deploy_time_grid_unit_consistency(self, tiny_cfg):
        """Closed-loop units check: a well-trained time-MLP deployed through
        stage_deploy must reproduce the TRUE time grids it was trained on.

        This is the regression test for the round-1 Pa-vs-bar input-scale bug
        (stage_deploy fed Pa pressures to MLPs built with bar scales, so the
        normalized pressure was ~5e4 and the predicted grids were garbage).
        """
        cfg = tiny_cfg
        if not os.path.exists(cfg.cases_csv):
            stages.stage_sample(cfg)
            stages.stage_simulate(cfg, verbose=False)
        # overfit the tiny sweep so MLP error is negligible vs a unit mismatch
        mlp_dir = stages.stage_train_profile_mlp(cfg.with_overrides(epochs=1500), "time")
        npz = f"{cfg.out_root}/crnn/training_history_JetSurf_Eoff.npz"
        stages.stage_deploy(cfg, npz, mlp_dir, eval_tag="_units")
        preds = sorted(
            glob.glob(f"{cfg.out_root}/predictions_JetSurf_Eoff_units/*.txt"),
            key=lambda p: int(p.rsplit("_", 1)[1][:-4]),
        )
        rel_errs = []
        for k, p in enumerate(preds):
            t_pred = np.loadtxt(p)[:, 0]
            truth = artifacts.read_trajectory_txt(
                f"{cfg.dataset_dir}/JetSurf_Eoff_{k + 1}.txt"
            )
            rel_errs.append(
                np.mean(np.abs(t_pred[1:] - truth["t"][1:]) / truth["t"][-1])
            )
        # with bar/Pa mixed up this is O(1); a fitted MLP lands well under 5%
        assert np.median(rel_errs) < 0.05, f"median rel err {np.median(rel_errs):.3f}"


class TestEonStages:
    """End-to-end Eon pipeline: adiabatic sweep -> temp-MLP -> Eon CRNN
    (substituted profiles) -> deploy with full-geometry + trim flow."""

    def test_eon_pipeline_end_to_end(self, tiny_cfg):
        cfg = dataclasses.replace(tiny_cfg, energy_on=True)
        if not os.path.exists(cfg.cases_csv):
            stages.stage_sample(cfg)
        paths = stages.stage_simulate(cfg, verbose=False)
        assert len(paths) == 16
        d = artifacts.read_trajectory_txt(paths[0])
        assert not np.allclose(d["T"], d["T"][0])  # adiabatic: T moves

        temp_dir = stages.stage_train_profile_mlp(cfg, "temp")
        assert os.path.exists(f"{temp_dir}/weights_JetSurf_2D.npz")
        npz = stages.stage_train_crnn(cfg, temp_mlp_dir=temp_dir)
        time_dir = stages.stage_train_profile_mlp(cfg, "time")

        out_csv = stages.stage_deploy(cfg, npz, time_dir, temp_mlp_dir=temp_dir)
        import pandas as pd

        df = pd.read_csv(out_csv)
        assert len(df) == 16 * 7
        assert np.isfinite(df["RMSE_time_avg"]).all()
        preds = sorted(glob.glob(f"{cfg.out_root}/predictions_JetSurf_Eon/*.txt"))
        assert len(preds) == 16
        mat = np.loadtxt(preds[0])
        assert mat.shape[1] == 12  # trimmed grid may be shorter than 7 rows
        assert np.all(np.isfinite(mat))


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
