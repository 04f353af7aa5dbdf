"""Unit tests for the Newton-Schulz preconditioner maintenance (solvers/linalg).

The round-4 instrumented bench showed every Jacobian refresh across all three
mechanisms falling through to the LU rescue, so inverse_refresh gained a
PRE-gate: the carried inverse's quality is measured after one matmul and the
NS polish runs only when it can mathematically contract (||I - A X||_inf < 1).
These tests pin the branch semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hexpyro.solvers import linalg


def _wellcond(B=2, n=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    A += n * np.eye(n, dtype=np.float32)  # diagonally dominant
    return jnp.asarray(A, dtype)


class TestInverseRefresh:
    def test_hopeless_carry_rescues_to_true_inverse(self):
        A = _wellcond()
        X0 = jnp.zeros_like(A)  # fresh/zero carry: resid0 == 1 -> hard failure
        X, rescued = linalg.inverse_refresh(X0, A, ns_iters=2)
        assert bool(rescued)
        err = jnp.max(jnp.abs(jnp.matmul(A, X) - jnp.eye(A.shape[1])))
        assert float(err) < 1e-3

    def test_contracting_carry_polishes_without_rescue(self):
        A = _wellcond()
        # a slightly-perturbed true inverse: resid0 << 1
        X0 = linalg.inverse_init(A) * 1.001
        X, rescued = linalg.inverse_refresh(X0, A, ns_iters=2)
        assert not bool(rescued)
        resid = jnp.max(
            jnp.sum(jnp.abs(jnp.eye(A.shape[1]) - jnp.matmul(A, X)), axis=2)
        )
        assert float(resid) < 0.1

    def test_nonfinite_carry_rescues(self):
        A = _wellcond()
        X0 = jnp.full_like(A, jnp.nan)
        X, rescued = linalg.inverse_refresh(X0, A, ns_iters=2)
        assert bool(rescued)
        assert bool(jnp.isfinite(X).all())

    def test_soft_gate_respects_allow_rescue(self):
        A = _wellcond()
        n = A.shape[1]
        # engineer a carry in the soft band: resid0 in (bad_threshold, 1)
        X0 = linalg.inverse_init(A) * (1.0 - 0.95 / n)
        resid0 = jnp.max(
            jnp.sum(jnp.abs(jnp.eye(n) - jnp.matmul(A, X0)), axis=2)
        )
        assert 0.0 < float(resid0) < 1.0
        # with a sky-high threshold nothing soft-rescues; ns_iters=1 gates on
        # the PRE-polish quality, so a strict threshold below resid0 rescues
        # only when allowed
        _, resc_hi = linalg.inverse_refresh(
            X0, A, ns_iters=1, bad_threshold=2.0
        )
        assert not bool(resc_hi)
        thresh = float(resid0) * 0.5
        _, resc_allowed = linalg.inverse_refresh(
            X0, A, ns_iters=1, bad_threshold=thresh, allow_rescue=True
        )
        _, resc_denied = linalg.inverse_refresh(
            X0, A, ns_iters=1, bad_threshold=thresh, allow_rescue=False
        )
        assert bool(resc_allowed)
        assert not bool(resc_denied)

    def test_polish_matches_manual_ns_steps(self):
        # the polish branch must perform exactly ns_iters NS updates
        A = _wellcond()
        n = A.shape[1]
        eye = jnp.eye(n, dtype=A.dtype)
        X0 = linalg.inverse_init(A) * 1.01
        got, rescued = linalg.inverse_refresh(
            X0, A, ns_iters=3, bad_threshold=2.0
        )
        assert not bool(rescued)
        want = X0
        for _ in range(3):
            E = eye - jnp.matmul(A, want)
            want = want + jnp.matmul(want, E)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=1e-6
        )

    def test_jit_traced_allow_rescue(self):
        A = _wellcond()
        X0 = jnp.zeros_like(A)

        @jax.jit
        def f(X0, A, allow):
            return linalg.inverse_refresh(X0, A, allow_rescue=allow)

        X, rescued = f(X0, A, jnp.asarray(False))
        assert bool(rescued)  # hard failures rescue regardless of allow


class TestBlockedLU:
    """blocked_lu_factor must be drop-in interchangeable with lu_factor."""

    @pytest.mark.parametrize(
        "B,n,panel", [(2, 300, 64), (2, 97, 32), (1, 129, 128)]
    )
    def test_matches_xla_lu(self, B, n, panel):
        rng = np.random.default_rng(n)
        A = jnp.asarray(rng.normal(size=(B, n, n)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(B, n, 1)).astype(np.float32))
        lu_b, piv_b = linalg.blocked_lu_factor(A, panel=panel)
        lu_p, piv_p = jax.scipy.linalg.lu_factor(A)
        # panel partial pivoting selects the same rows as full partial
        # pivoting (both pick the max-abs element of the current column
        # within the trailing rows), so the factorizations are comparable
        # elementwise, not just as solve operators
        np.testing.assert_array_equal(np.asarray(piv_b), np.asarray(piv_p))
        xb = jax.scipy.linalg.lu_solve((lu_b, piv_b), b)
        want = np.linalg.solve(
            np.asarray(A, np.float64), np.asarray(b, np.float64)
        )
        err = np.max(np.abs(np.asarray(xb) - want) / (1 + np.abs(want)))
        assert err < 1e-3

    def test_inverse_init_blocked(self):
        A = _wellcond(B=2, n=200, seed=3)
        X = linalg.inverse_init(A, lu_panel=64)
        X0 = linalg.inverse_init(A)
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(X0), rtol=0, atol=1e-5
        )

    def test_refresh_with_blocked_rescue(self):
        A = _wellcond(B=2, n=96, seed=4)
        X, rescued = linalg.inverse_refresh(
            jnp.zeros_like(A), A, lu_panel=32
        )
        assert bool(rescued)
        err = jnp.max(jnp.abs(jnp.matmul(A, X) - jnp.eye(96)))
        assert float(err) < 1e-3

    def test_inverse_init_qr(self):
        A = _wellcond(B=2, n=200, seed=5)
        Xq = linalg.inverse_init(A, kind="qr")
        err = jnp.max(jnp.abs(jnp.matmul(A, Xq) - jnp.eye(200)))
        assert float(err) < 1e-3

    def test_refresh_with_qr_rescue(self):
        A = _wellcond(B=2, n=96, seed=6)
        X, rescued = linalg.inverse_refresh(
            jnp.zeros_like(A), A, rescue_kind="qr"
        )
        assert bool(rescued)
        err = jnp.max(jnp.abs(jnp.matmul(A, X) - jnp.eye(96)))
        assert float(err) < 1e-3


class TestNsStateRoundtrip:
    def test_refresh_then_solve(self):
        A = _wellcond(B=3, n=24, seed=1)
        st = linalg.ns_init_state(3, 24, jnp.float32)
        st, rescued = linalg.ns_refresh_state(st, A)
        assert bool(rescued)  # zero carry is a hard failure
        b = jnp.asarray(np.random.default_rng(2).normal(size=(3, 24)),
                        jnp.float32)
        x = linalg.ns_solve(st, b, iters=3)
        np.testing.assert_allclose(
            np.asarray(jnp.einsum("bij,bj->bi", A, x)), np.asarray(b),
            rtol=2e-4, atol=2e-4,
        )
