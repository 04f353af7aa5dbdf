"""Steady-state CSTR + PFR chain tests.

The toy mechanism (first-order A2 -> B2 -> C2, equal molecular weights) has a
closed-form CSTR steady state: with flow = mdot/(V rho) the species balance
reduces to Y_A* = f Y_A,in/(f + k1), Y_B* = (f Y_B,in + k1 Y_A*)/(f + k2),
giving an exact analytic check of the pseudo-transient Newton solver.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from hexpyro.mechanism import load_mechanism, to_device_arrays
from hexpyro.reactors.cstr import SteadyOptions, solve_steady_eoff, solve_steady_eon
from hexpyro.reactors.pfr import simulate_pfr, tracked_indices
from hexpyro.thermo import nasa7

TOY = os.path.join(os.path.dirname(__file__), "data", "toy.yaml")


@pytest.fixture(scope="module")
def toy():
    return load_mechanism(TOY)


@pytest.fixture(scope="module")
def toy_dev(toy):
    return to_device_arrays(toy)


class TestSteadyCSTR:
    def test_eoff_analytic(self, toy, toy_dev):
        arr = toy_dev
        B = 3
        T0 = jnp.array([900.0, 1000.0, 1100.0])
        P0 = jnp.full(B, 1.0e5)
        Y_in = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1))
        rho = nasa7.density(T0, P0, Y_in, arr.mw)
        t_res = jnp.array([1e-3, 5e-3, 2e-2])
        mdot_over_V = rho / t_res
        Y, info = solve_steady_eoff(Y_in, T0, P0, Y_in, mdot_over_V, arr, SteadyOptions())
        assert bool(info["converged"].all())
        k1, k2 = 200.0, 50.0
        f = np.asarray(1.0 / t_res)  # equal MW => flow = 1/t_res exactly at Y*?
        # flow = mdot/(V rho(Y*)); all MW equal so rho is composition-independent
        YA = f / (f + k1)
        YB = (k1 * YA) / (f + k2)
        np.testing.assert_allclose(np.asarray(Y[:, 0]), YA, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(Y[:, 1]), YB, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(Y.sum(1)), 1.0, atol=1e-12)

    def test_eon_enthalpy_conservation(self, toy, toy_dev):
        arr = toy_dev
        B = 2
        T_in = jnp.array([900.0, 1000.0])
        P0 = jnp.full(B, 1.0e5)
        Y_in = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (B, 1))
        rho = nasa7.density(T_in, P0, Y_in, arr.mw)
        mdot_over_V = rho / 5e-3
        h_in = nasa7.enthalpy_mass(T_in, Y_in, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
        Y, T, info = solve_steady_eon(
            Y_in, T_in, P0, Y_in, h_in, mdot_over_V, arr, SteadyOptions()
        )
        assert bool(info["converged"].all())
        # exothermic cascade (B2, C2 lower enthalpy) => temperature rises
        assert np.all(np.asarray(T) > np.asarray(T_in))
        h_out = nasa7.enthalpy_mass(T, Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs)
        np.testing.assert_allclose(np.asarray(h_out), np.asarray(h_in), rtol=1e-7)


class TestPFRChain:
    def test_toy_chain_approaches_batch_limit(self, toy, toy_dev):
        """Long residence time -> full conversion to C2 at the outlet."""
        traj = simulate_pfr(
            toy_dev,
            jnp.array([1000.0]),
            jnp.array([1e5]),
            Y_feed=jnp.array([1.0, 0.0, 0.0]),
            length=1.0,
            u0=2.5,
            n_steps=50,
        )
        assert bool(traj.converged.all())
        # residence time ~= L/u = 0.4 s; k1 t ~ 80 => A2 gone, C2 dominant
        assert float(traj.Y[0, -1, 0]) < 1e-3
        assert float(traj.Y[0, -1, 2]) > 0.9
        # time is strictly increasing, velocity constant (equal MW, isothermal)
        assert np.all(np.diff(np.asarray(traj.t[0])) > 0)
        np.testing.assert_allclose(np.asarray(traj.u[0]), 2.5, rtol=1e-8)

    def test_jetsurf_short_chain_eoff(self, jetsurf, jetsurf_dev):
        arr = jetsurf_dev
        T0 = jnp.array([1000.0, 1100.0])
        P0 = jnp.array([2.0e5, 1.0e5])
        traj = simulate_pfr(
            arr, T0, P0, species_names=jetsurf.species_names, n_steps=10
        )
        assert bool(traj.converged.all())
        i_hex = jetsurf.species_index("NC6H14")
        Yh = np.asarray(traj.Y[:, :, i_hex])
        # hexane strictly consumed along the reactor
        assert np.all(np.diff(Yh, axis=1) < 0)
        # hotter case converts faster
        assert Yh[1, -1] < Yh[0, -1]
        # elemental mass fractions conserved along the chain (steady-state exact)
        elem_mass = np.asarray(
            jnp.einsum("bns,se,s->bne", traj.Y, arr.composition, 1.0 / arr.mw)
        )
        drift = np.abs(elem_mass - elem_mass[:, :1, :]).max() / elem_mass.max()
        assert drift < 1e-5  # ~10 segments x per-segment rtol 1e-6
        # time increasing, velocity rises as moles increase (cracking)
        assert np.all(np.diff(np.asarray(traj.t), axis=1) > 0)
        assert float(traj.u[0, -1]) > float(traj.u[0, 0])

    def test_project_tracked_matches_host_projection(self, jetsurf, jetsurf_dev):
        """simulate_pfr(project_tracked=...) returns the tracked species'
        concentrations computed on device, bit-identical to the host-side
        concentrations() path it replaces (pfr.py; cuts the sweep's
        device->host transfer by ~ns/9)."""
        arr = jetsurf_dev
        tr = np.asarray(tracked_indices(jetsurf.species_names))
        T0 = jnp.array([1000.0, 1100.0])
        P0 = jnp.array([2.0e5, 1.0e5])
        kw = dict(species_names=jetsurf.species_names, n_steps=5, length=5 / 800.0)
        full = simulate_pfr(arr, T0, P0, **kw)
        proj = simulate_pfr(arr, T0, P0, project_tracked=tr, **kw)
        C_host = np.asarray(full.concentrations(arr))[:, :, tr]
        np.testing.assert_array_equal(np.asarray(proj.Y), C_host)
        np.testing.assert_array_equal(np.asarray(proj.t), np.asarray(full.t))

    def test_jetsurf_eon_endothermic(self, jetsurf, jetsurf_dev):
        arr = jetsurf_dev
        T0 = jnp.array([1100.0])
        P0 = jnp.array([2.0e5])
        traj = simulate_pfr(
            arr, T0, P0, species_names=jetsurf.species_names, n_steps=10, energy_on=True
        )
        assert bool(traj.converged.all())
        T = np.asarray(traj.T[0])
        # hexane pyrolysis is endothermic: adiabatic T falls monotonically
        assert np.all(np.diff(T) <= 1e-6)
        assert T[-1] < T[0] - 1.0

    def test_tracked_indices(self, jetsurf, llnl):
        idx_j = tracked_indices(jetsurf.species_names)
        idx_l = tracked_indices(llnl.species_names)
        assert len(idx_j) == len(idx_l) == 9
        assert jetsurf.species_names[idx_j[6]] == "NC6H14"
        assert llnl.species_names[idx_l[5]] == "C4H8-1"
        assert jetsurf.species_names[idx_j[5]] == "C4H81"


class TestSolverVariants:
    def test_nsinv_matches_lu(self, jetsurf, jetsurf_dev):
        """Both linear solvers must converge to the same steady states.

        nsinv is the f32-tolerance production path (the 2-step Newton-Schulz
        refresh bounds solve accuracy around ~1e-2 relative, plenty for
        rtol 1e-4 Newton but not for the f64 default rtol 1e-6), so both arms
        run at the f32 tolerances here.
        """
        T0 = jnp.array([1050.0])
        P0 = jnp.array([2.0e5])
        kw = dict(rtol=1e-4, atol_Y=1e-9, stall_accept=30.0, stall_iters=8)
        # production-sized segments (dz = 1/800 m): the nsinv preconditioner is
        # designed for the gentle continuation of the real chain
        t_lu = simulate_pfr(
            jetsurf_dev, T0, P0, species_names=jetsurf.species_names, n_steps=8,
            length=8 / 800.0, opts=SteadyOptions(linear_solver="lu", **kw),
        )
        t_ns = simulate_pfr(
            jetsurf_dev, T0, P0, species_names=jetsurf.species_names, n_steps=8,
            length=8 / 800.0, opts=SteadyOptions(linear_solver="nsinv", **kw),
        )
        assert bool(t_lu.converged.all()) and bool(t_ns.converged.all())
        scale = float(jnp.abs(t_lu.Y).max())
        assert float(jnp.abs(t_ns.Y - t_lu.Y).max()) / scale < 1e-3

    def test_carry_jacobian_matches_per_segment_refresh(self, jetsurf, jetsurf_dev):
        """carry_jacobian skips the forced Jacobian rebuild at segment entry
        (modified Newton with the previous segment's preconditioner); steady
        states must agree with the per-segment-refresh path since convergence
        is declared on the exact residual either way."""
        import dataclasses

        from hexpyro.reactors.cstr import default_steady_options

        T0 = jnp.array([950.0, 1100.0])
        P0 = jnp.array([1.5e5, 2.5e5])
        opts = default_steady_options(jnp.float32)
        for energy_on in (False, True):
            # NB: the f32 default has carry_jacobian=True, so the baseline arm
            # must explicitly force the per-segment refresh OFF (a base using
            # the defaults verbatim would silently compare carry against carry)
            base = simulate_pfr(
                jetsurf_dev, T0, P0, species_names=jetsurf.species_names,
                n_steps=10, length=10 / 800.0, energy_on=energy_on,
                opts=dataclasses.replace(opts, carry_jacobian=False),
            )
            carry = simulate_pfr(
                jetsurf_dev, T0, P0, species_names=jetsurf.species_names,
                n_steps=10, length=10 / 800.0, energy_on=energy_on,
                opts=dataclasses.replace(opts, carry_jacobian=True),
            )
            assert bool(carry.converged.all())
            assert float(jnp.abs(carry.Y - base.Y).max()) < 5e-5
            assert float(jnp.abs(carry.T - base.T).max()) < 0.5
            # FLOP-accounting counters (bench.py pfr_flop_model inputs): one
            # refresh count and rescue count per segment, rescues <= refreshes,
            # and carrying the Jacobian must strictly reduce refresh work
            for tr in (base, carry):
                refs = np.asarray(tr.jac_refreshes)
                rescs = np.asarray(tr.prec_rescues)
                assert refs.shape == np.asarray(tr.newton_iters).shape
                assert (rescs <= refs).all() and (refs >= 0).all()
            assert np.asarray(carry.jac_refreshes).sum() < np.asarray(
                base.jac_refreshes).sum()

    def test_windowed_matches_monolithic(self, jetsurf, jetsurf_dev):
        from hexpyro.reactors.pfr import simulate_pfr_windowed

        T0 = jnp.array([1050.0])
        P0 = jnp.array([2.0e5])
        full = simulate_pfr(
            jetsurf_dev, T0, P0, species_names=jetsurf.species_names, n_steps=12
        )
        win = simulate_pfr_windowed(
            jetsurf_dev, T0, P0, species_names=jetsurf.species_names,
            n_steps=12, window=4,
        )
        assert bool(win.converged.all())
        assert float(np.abs(np.asarray(win.Y) - np.asarray(full.Y)).max()) < 1e-5
        # t accumulates per-segment rho differences within solver tolerance
        # (both runs converge to rtol 1e-6), so allow a few e-8 of drift
        assert float(np.abs(np.asarray(win.t) - np.asarray(full.t)).max()) < 1e-7


class TestEonJacobianFinite:
    @pytest.mark.slow
    def test_llnl_eon_f32_segment_converges(self):
        """Regression: jax.jvp of wdot wrt T overflowed f32 to NaN for
        LLNL-sized rate exponents, poisoning every Eon Jacobian so the LLNL
        adiabatic solve froze at T0 (fixed with a finite-difference dw/dT in
        solve_steady_eon.build_fac)."""
        mech = load_mechanism(
            "/root/reference/DETAILED_KINETIC_MODEL/LLNL.yaml", name="LLNL"
        )
        arr = to_device_arrays(mech, dtype=jnp.float32)
        traj = simulate_pfr(
            arr, jnp.full((1,), 1000.0), jnp.full((1,), 2.0e5),
            species_names=mech.species_names, n_steps=3, energy_on=True,
        )
        assert bool(np.asarray(traj.converged).all())
        T = np.asarray(traj.T)[0]
        assert np.isfinite(T).all()
        # adiabatic pyrolysis cools the gas; fixed-point would stay at 1000.0
        assert T[-1] < 999.0
        assert np.asarray(traj.newton_iters).max() <= 40

    @pytest.mark.slow
    def test_llnl_eon_no_quench_basin_hop(self):
        """Regression: flagship LLNL Eon case 102 (T0=1089.2 K, P=1.451 bar)
        quenched 825 K in ONE segment -- the accept controller's 2x-per-step
        tolerance ratcheted (gnorm updates on every accepted step), letting the
        lane walk into the spurious cold branch over a few dozen iterations.
        Fixed by the best-so-far diverge_cap + the per-segment dT trust region
        + best-iterate return (reactors/cstr.py)."""
        mech = load_mechanism(
            "/root/reference/DETAILED_KINETIC_MODEL/LLNL.yaml", name="LLNL"
        )
        arr = to_device_arrays(mech, dtype=jnp.float32)
        from hexpyro.reactors.cstr import default_steady_options
        from hexpyro.thermo import nasa7

        traj = simulate_pfr(
            arr, jnp.full((1,), 1089.22531), jnp.full((1,), 1.45106821e5),
            species_names=mech.species_names, n_steps=6, length=6 / 800.0,
            energy_on=True,
            opts=default_steady_options(jnp.float32),  # production f32 path
        )
        T = np.asarray(traj.T)[0]
        assert np.isfinite(T).all()
        # pre-fix this collapsed to 264 K by segment 4; the true f64
        # transient-tracking answer is -5.28 K on segment 1, ~ -22 K over 6
        assert T.min() > T[0] - 40.0
        assert abs((T[1] - T[0]) - (-5.28)) < 1.0
        assert float(np.asarray(traj.max_resid)[0]) < 300.0
        # adiabatic invariant: h(T_n, Y_n) == h(T0, Y_feed) along the chain
        Y = jnp.asarray(traj.Y[0])
        h = nasa7.enthalpy_mass(
            jnp.asarray(T), Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs
        )
        cp = nasa7.cp_mass(
            jnp.asarray(T), Y, arr.mw, arr.nasa_tmid, arr.nasa_coeffs
        )
        drift_K = np.abs(np.asarray((h - h[0]) / cp))
        assert drift_K.max() < 1.0
