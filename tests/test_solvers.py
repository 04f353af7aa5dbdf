"""dopri5 integrator tests: accuracy vs analytic solutions, gradients, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from hexpyro.solvers.dopri5 import odeint_dopri5


class TestDopri5:
    def test_exponential_decay(self):
        rhs = lambda t, u: -2.0 * u
        ts = jnp.linspace(0.0, 3.0, 31)
        ys = odeint_dopri5(rhs, jnp.array([1.0, 5.0]), ts, rtol=1e-8, atol=1e-10)
        expected = np.exp(-2.0 * np.asarray(ts))[:, None] * np.array([1.0, 5.0])
        np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-6)

    def test_nonuniform_grid_harmonic(self):
        """x'' = -x via first-order system on a log-spaced grid."""
        rhs = lambda t, u: jnp.array([u[1], -u[0]])
        ts = jnp.concatenate([jnp.array([0.0]), jnp.logspace(-3, jnp.log10(6.0), 100)])
        ys = odeint_dopri5(rhs, jnp.array([1.0, 0.0]), ts, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(ys[:, 0]), np.cos(np.asarray(ts)), atol=1e-5
        )

    def test_time_dependent_rhs(self):
        rhs = lambda t, u: jnp.cos(t) * u  # u = exp(sin t)
        ts = jnp.linspace(0.0, 4.0, 41)
        ys = odeint_dopri5(rhs, jnp.array([1.0]), ts, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ys[:, 0]), np.exp(np.sin(np.asarray(ts))), rtol=1e-6
        )

    def test_gradient_through_solver(self):
        """d/dk of u(T; k) for u' = -k u equals -T u -- checks backprop through
        the scan-based adaptive loop (the mechanism CRNN training relies on)."""

        def loss(k):
            rhs = lambda t, u: -k * u
            ts = jnp.linspace(0.0, 2.0, 21)
            ys = odeint_dopri5(rhs, jnp.array([1.0]), ts, rtol=1e-10, atol=1e-12)
            return ys[-1, 0]

        k = 0.7
        g = jax.grad(loss)(k)
        expected = -2.0 * np.exp(-k * 2.0)
        assert np.isclose(float(g), expected, rtol=1e-6)

    def test_vmap_batching(self):
        ks = jnp.array([0.5, 1.0, 2.0])
        ts = jnp.linspace(0.0, 1.0, 11)

        def solve(k):
            return odeint_dopri5(lambda t, u: -k * u, jnp.array([1.0]), ts, rtol=1e-8, atol=1e-10)

        ys = jax.vmap(solve)(ks)
        expected = np.exp(-np.asarray(ks)[:, None] * np.asarray(ts))
        np.testing.assert_allclose(np.asarray(ys[..., 0]), expected, rtol=1e-6)

    def test_moderately_stiff(self):
        """lambda = -500 linear problem at loose tolerance stays stable/accurate
        at the output points (the CRNN's du clamp regime)."""
        rhs = lambda t, u: -500.0 * (u - jnp.cos(t))
        ts = jnp.linspace(0.0, 1.0, 11)
        ys = odeint_dopri5(
            rhs, jnp.array([0.0]), ts, rtol=1e-6, atol=1e-8, max_steps_per_interval=64
        )
        # quasi-steady solution ~ cos(t) for t >> 1/500
        np.testing.assert_allclose(
            np.asarray(ys[3:, 0]), np.cos(np.asarray(ts[3:])), atol=5e-3
        )

    def test_mixed_dtype_time_grid(self):
        """Regression: an f64 ts with f32 state crashed the scan carry with a
        dtype promotion TypeError; ts is now cast to the state dtype."""
        u0 = jnp.array([1.0, 0.5], jnp.float32)
        ts = jnp.linspace(0.0, 2.0, 21).astype(jnp.float64)
        ys = odeint_dopri5(lambda t, u: -u, u0, ts)
        assert ys.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(ys[-1]), np.asarray(u0) * np.exp(-2.0), rtol=1e-4
        )

    def test_exhausted_budget_lags_not_zeros(self):
        """An interval whose adaptive-step budget runs out must emit the state
        reached so far (lagging the true solution), NEVER a zero row -- the
        round-1 scan carried a zero-initialized output array and returned
        zeros for the unreached tail, silently corrupting training losses."""
        u0 = jnp.array([1.0])
        ts = jnp.linspace(0.0, 1.0, 11)
        # budget 1 step/interval at extreme tolerance: every step is rejected,
        # so the state barely advances and every output lags
        ys = odeint_dopri5(
            lambda t, u: -u, u0, ts, rtol=1e-14, atol=1e-14,
            max_steps_per_interval=1,
        )
        ys = np.asarray(ys)
        assert np.all(np.isfinite(ys))
        # lagged, not frozen-at-zero: outputs stay within the true range
        assert np.all(ys > np.exp(-1.0) - 1e-6)
        assert np.all(ys <= 1.0 + 1e-6)
        # monotone non-increasing (decay ODE): lagging preserves the shape
        assert np.all(np.diff(ys[:, 0]) <= 1e-9)
