"""Cross-stage artifact compatibility: simulate -> txt -> trainer loaders."""

import numpy as np
import jax.numpy as jnp

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.pipeline import artifacts
from hexpyro.reactors.pfr import simulate_pfr, tracked_indices
from hexpyro.training.crnn_trainer import load_crnn_dataset


def test_sweep_txt_roundtrip(tmp_path, jetsurf, jetsurf_dev):
    """write_sweep output must parse through the CRNN dataset loader with the
    reference's column conventions (concentration x1e3, T/P columns, time)."""
    traj = simulate_pfr(
        jetsurf_dev,
        jnp.array([1000.0, 1100.0]),
        jnp.array([2e5, 1.5e5]),
        species_names=jetsurf.species_names,
        n_steps=12,
    )
    tracked = tracked_indices(jetsurf.species_names)
    paths = artifacts.write_sweep(
        str(tmp_path), "JetSurf", False, traj, jetsurf_dev, tracked
    )
    assert len(paths) == 2 and paths[0].endswith("JetSurf_Eoff_1.txt")

    ds = load_crnn_dataset(paths)
    assert ds.tsteps.shape == (2, 13)
    assert ds.ylabel.shape == (2, 9, 13)
    np.testing.assert_allclose(ds.tsteps, np.asarray(traj.t), rtol=1e-12)
    np.testing.assert_allclose(ds.Tlist, np.asarray(traj.T), rtol=1e-12)
    # loader multiplies kmol/m^3 -> mol/m^3
    C = np.asarray(traj.concentrations(jetsurf_dev))[:, :, tracked]
    np.testing.assert_allclose(ds.ylabel, np.swapaxes(C, 1, 2) * 1e3, rtol=1e-12)
    # u0 column = t=0 concentrations; hexane nonzero, products zero
    assert ds.u0[0, 6] > 0
    assert np.all(ds.u0[:, :6] == 0)


def test_crnn_history_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params = [
        {"w_in": rng.random((11, 9)), "w_b": rng.random(9), "w_out": rng.random((9, 9))}
        for _ in range(3)
    ]
    path = str(tmp_path / "hist.npz")
    artifacts.save_crnn_history(path, [1.0, 0.5, 0.2], [1.1, 0.6, 0.3], params,
                                final=params[-1], updated_p=rng.random(189))
    w_in, w_b, w_out = artifacts.load_crnn_parameters(path)
    np.testing.assert_allclose(w_in, params[-1]["w_in"])
    tr, va = artifacts.load_crnn_history_losses(path)
    assert tr[-1] == 0.2 and va[0] == 1.1


def test_mlp_params_roundtrip(tmp_path):
    import jax

    from hexpyro.surrogate import mlp

    model, params = mlp.init_params(0, 4, 16)
    path = str(tmp_path / "w.npz")
    artifacts.save_mlp_params(path, params)
    loaded = artifacts.load_mlp_params_npz(path)
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": params}, x)),
        np.asarray(model.apply({"params": jax.tree_util.tree_map(jnp.asarray, loaded)}, x)),
        rtol=1e-6,
    )
