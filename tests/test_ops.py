"""Pallas kernel tests (interpret mode on CPU; perf is measured on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hexpyro.ops.lu_pallas import lu_solve_nopivot


class TestLuPallas:
    @pytest.mark.parametrize("B,n", [(3, 64), (2, 130), (1, 384)])
    def test_matches_numpy_solve(self, B, n):
        rng = np.random.default_rng(0)
        # diagonally dominant (the kernel's contract: equilibrated + PTC-damped)
        A = rng.random((B, n, n)).astype(np.float32) + n * np.eye(n, dtype=np.float32)
        b = rng.random((B, n)).astype(np.float32)
        x = np.asarray(lu_solve_nopivot(jnp.asarray(A), jnp.asarray(b), interpret=True))
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        assert np.abs(x - x_ref).max() / np.abs(x_ref).max() < 1e-5

    def test_padding_identity_block(self):
        """n not a multiple of 128 pads with identity; solution unchanged."""
        rng = np.random.default_rng(1)
        n = 100
        A = rng.random((1, n, n)).astype(np.float32) + n * np.eye(n, dtype=np.float32)
        b = rng.random((1, n)).astype(np.float32)
        x = np.asarray(lu_solve_nopivot(jnp.asarray(A), jnp.asarray(b), interpret=True))
        assert x.shape == (1, n)
        x_ref = np.linalg.solve(A.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        assert np.abs(x - x_ref).max() / np.abs(x_ref).max() < 1e-5
