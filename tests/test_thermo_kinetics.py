"""Thermo + kinetics unit tests.

Validation strategy (no Cantera in this environment):
  * NASA7 polynomials vs independently hand-evaluated values;
  * formation enthalpies of reference elements ~ 0 at 298.15 K;
  * rate constants vs a straight numpy re-evaluation of the Arrhenius law;
  * Troe falloff vs an independent numpy implementation of the blending formula;
  * wdot element conservation (exact invariant) and finiteness across the
    reference's full (T, P) operating envelope.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hexpyro.constants import GAS_CONSTANT, ONE_ATM
from hexpyro.kinetics import ln_rate_constants, wdot, wdot_and_jacobian
from hexpyro.mechanism import to_device_arrays
from hexpyro.thermo import nasa7


def _feed_Y(mech):
    return np.asarray(
        nasa7.mass_fractions_from_composition_string(
            "NC6H14:1.0, H2O:0.7", mech.species_names, mech.molecular_weights
        )
    )


class TestNasa7:
    def test_h2_cp_298(self, jetsurf):
        arr = to_device_arrays(jetsurf)
        i = jetsurf.species_index("H2")
        # independent evaluation of the low-T polynomial
        a = jetsurf.nasa_coeffs[i, 0]
        T = 298.15
        cp_expected = a[0] + a[1] * T + a[2] * T**2 + a[3] * T**3 + a[4] * T**4
        cp = nasa7.cp_R(jnp.array([T]), arr.nasa_tmid, arr.nasa_coeffs)[0, i]
        assert np.isclose(float(cp), cp_expected, rtol=1e-12)
        # H2 cp at 298 K is ~28.8 J/mol/K
        assert 3.4 < float(cp) < 3.55

    def test_reference_elements_zero_formation_enthalpy(self, jetsurf):
        arr = to_device_arrays(jetsurf)
        T = jnp.array([298.15])
        h = nasa7.h_RT(T, arr.nasa_tmid, arr.nasa_coeffs)[0] * GAS_CONSTANT * 298.15
        for name in ("H2", "O2", "N2"):
            i = jetsurf.species_index(name)
            assert abs(float(h[i])) < 1.5e5  # < 150 J/mol in J/kmol

    def test_branch_continuity_at_tmid(self, jetsurf):
        """cp low/high polynomials must agree at Tmid (NASA7 fits are continuous)."""
        arr = to_device_arrays(jetsurf)
        tmid = np.asarray(jetsurf.nasa_tmid)
        below = nasa7.cp_R(jnp.asarray(tmid - 1e-4), arr.nasa_tmid[:, None].T * 0 + arr.nasa_tmid, arr.nasa_coeffs)
        # evaluate each species at its own tmid via diagonal
        cps_lo = np.array([float(nasa7.cp_R(jnp.array([t - 1e-6]), arr.nasa_tmid, arr.nasa_coeffs)[0, i]) for i, t in enumerate(tmid[:20])])
        cps_hi = np.array([float(nasa7.cp_R(jnp.array([t + 1e-6]), arr.nasa_tmid, arr.nasa_coeffs)[0, i]) for i, t in enumerate(tmid[:20])])
        assert np.allclose(cps_lo, cps_hi, rtol=2e-3)

    def test_mixture_density(self, jetsurf):
        arr = to_device_arrays(jetsurf)
        Y = jnp.asarray(_feed_Y(jetsurf))
        T, P = 1000.0, 2.0e5
        rho = nasa7.density(jnp.array([T]), jnp.array([P]), Y[None, :], arr.mw)[0]
        wbar = float(nasa7.mean_molecular_weight(Y, arr.mw))
        assert np.isclose(float(rho), P * wbar / (GAS_CONSTANT * T), rtol=1e-12)
        # hexane:steam 1:0.7 by mass -> mean MW ~ 33.7 kg/kmol
        assert 32.0 < wbar < 35.0

    def test_concentration_roundtrip(self, jetsurf):
        arr = to_device_arrays(jetsurf)
        Y = jnp.asarray(_feed_Y(jetsurf))[None, :]
        C = nasa7.concentrations(jnp.array([1000.0]), jnp.array([2e5]), Y, arr.mw)
        Y2 = nasa7.mass_fractions_from_concentrations(C, arr.mw)
        np.testing.assert_allclose(np.asarray(Y2), np.asarray(Y), atol=1e-14)
        # ideal gas: total molar concentration = P/(RT)
        assert np.isclose(float(C.sum()), 2e5 / (GAS_CONSTANT * 1000.0), rtol=1e-12)


class TestRateConstants:
    def test_plain_arrhenius(self, jetsurf, jetsurf_dev):
        j = jetsurf.equations.index("H + O2 <=> O + OH")
        T = np.array([900.0, 1100.0, 1500.0])
        C = jnp.ones((3, jetsurf.n_species)) * 1e-3
        lnk, ln_tb = ln_rate_constants(jnp.asarray(T), jnp.full(3, 2e5), C, jetsurf_dev)
        expected = jetsurf.lnA[j] + jetsurf.beta[j] * np.log(T) - jetsurf.EaR[j] / T
        np.testing.assert_allclose(np.asarray(lnk)[:, j], expected, rtol=1e-12)
        assert np.all(np.asarray(ln_tb)[:, j] == 0.0)

    def test_three_body_factor(self, jetsurf, jetsurf_dev):
        j = jetsurf.equations.index("H + H + M <=> H2 + M")
        fi = list(jetsurf.tb_idx).index(j)
        C = np.zeros((1, jetsurf.n_species))
        C[0, jetsurf.species_index("AR")] = 0.01  # eff 0.63
        C[0, jetsurf.species_index("CH4")] = 0.02  # eff 1.0
        _, ln_tb = ln_rate_constants(
            jnp.array([1000.0]), jnp.array([1e5]), jnp.asarray(C), jetsurf_dev
        )
        expected_M = 0.63 * 0.01 + 1.0 * 0.02
        assert np.isclose(float(ln_tb[0, j]), np.log(expected_M), rtol=1e-12)

    def test_troe_falloff_vs_numpy(self, jetsurf, jetsurf_dev):
        """Independent numpy Troe evaluation for OH + OH (+M) <=> H2O2 (+M)."""
        j = jetsurf.equations.index("OH + OH (+ M) <=> H2O2 (+ M)")
        fi = list(jetsurf.fo_idx).index(j)
        T = 1050.0
        C = np.zeros((1, jetsurf.n_species))
        C[0, jetsurf.species_index("N2")] = 0.015
        C[0, jetsurf.species_index("H2O")] = 0.005  # eff 6.0
        M = float(C[0] @ jetsurf.fo_eff[fi])

        kinf = np.exp(jetsurf.lnA[j]) * T ** jetsurf.beta[j] * np.exp(-jetsurf.EaR[j] / T)
        lnA0, b0, EaR0 = jetsurf.fo_low[fi]
        k0 = np.exp(lnA0) * T**b0 * np.exp(-EaR0 / T)
        Pr = k0 * M / kinf
        a, T3, T1, T2 = jetsurf.fo_troe[fi]
        Fcent = (1 - a) * np.exp(-T / T3) + a * np.exp(-T / T1) + np.exp(-T2 / T)
        lF = np.log10(Fcent)
        c = -0.4 - 0.67 * lF
        n = 0.75 - 1.27 * lF
        f1 = (np.log10(Pr) + c) / (n - 0.14 * (np.log10(Pr) + c))
        F = 10 ** (lF / (1 + f1**2))
        k_expected = kinf * Pr / (1 + Pr) * F

        lnk, _ = ln_rate_constants(
            jnp.array([T]), jnp.array([1e5]), jnp.asarray(C), jetsurf_dev
        )
        assert np.isclose(float(np.exp(lnk[0, j])), k_expected, rtol=1e-10)

    def test_plog_interpolation(self, nuig):
        arr = to_device_arrays(nuig)
        j = nuig.equations.index("CO + OH <=> HOCO")
        pi = list(nuig.plog_idx).index(j)
        T = 1000.0
        C = jnp.ones((1, nuig.n_species)) * 1e-4

        def k_at_level(li):
            terms = 0.0
            for ti in range(nuig.plog_lnA.shape[2]):
                sg = nuig.plog_sgnA[pi, li, ti]
                if sg == 0:
                    continue
                terms += sg * np.exp(
                    nuig.plog_lnA[pi, li, ti]
                    + nuig.plog_beta[pi, li, ti] * np.log(T)
                    - nuig.plog_EaR[pi, li, ti] / T
                )
            return terms

        # at an exact tabulated pressure -> exactly that level's k
        P1 = float(np.exp(nuig.plog_lnP[pi, 1]))
        lnk, _ = ln_rate_constants(jnp.array([T]), jnp.array([P1]), C, arr)
        assert np.isclose(float(np.exp(lnk[0, j])), k_at_level(1), rtol=1e-8)

        # between levels 1 and 2 -> log-log interpolation
        Pm = np.sqrt(P1 * float(np.exp(nuig.plog_lnP[pi, 2])))
        lnk_m, _ = ln_rate_constants(jnp.array([T]), jnp.array([Pm]), C, arr)
        expect = 0.5 * (np.log(k_at_level(1)) + np.log(k_at_level(2)))
        assert np.isclose(float(lnk_m[0, j]), expect, rtol=1e-8)

        # below the lowest level -> clamped to level 0
        lnk_lo, _ = ln_rate_constants(jnp.array([T]), jnp.array([1.0]), C, arr)
        assert np.isclose(float(np.exp(lnk_lo[0, j])), k_at_level(0), rtol=1e-8)


class TestWdot:
    @pytest.mark.parametrize("mech_name", ["jetsurf", "llnl", "nuig"])
    def test_element_conservation_and_finiteness(self, mech_name, request):
        mech = request.getfixturevalue(mech_name)
        arr = to_device_arrays(mech)
        Y = jnp.asarray(_feed_Y(mech))
        T = jnp.array([870.0, 1000.0, 1150.0, 1200.0])
        P = jnp.array([1e5, 1.5e5, 2e5, 3e5])
        C = nasa7.concentrations(T, P, jnp.broadcast_to(Y, (4, mech.n_species)), arr.mw)
        w = wdot(T, P, C, arr)
        assert np.all(np.isfinite(np.asarray(w)))
        # exact invariant: element production rates vanish
        elem_rates = np.asarray(w @ arr.composition)
        scale = np.abs(np.asarray(w)).max()
        assert np.abs(elem_rates).max() < 1e-10 * max(scale, 1.0)
        # mass conservation: sum_k wdot_k * W_k == 0
        mass_rate = np.asarray(w @ arr.mw)
        assert np.abs(mass_rate).max() < 1e-8 * max(scale, 1.0)
        # hexane must be consumed at pyrolysis temperature
        i_hex = mech.species_index("NC6H14")
        assert float(w[2, i_hex]) < 0.0

    def test_equilibrium_detailed_balance(self, jetsurf):
        """At thermodynamic equilibrium composition of H2/O2/H2O the reversible
        2-species subnet H + O2 <=> O + OH must satisfy R_f/R_r = 1 when the
        concentrations are set to satisfy Kc exactly."""
        from hexpyro.kinetics import ln_equilibrium_constants, rates_of_progress

        arr = to_device_arrays(jetsurf)
        j = jetsurf.equations.index("H + O2 <=> O + OH")
        T = jnp.array([1400.0])
        lnKc = float(ln_equilibrium_constants(T, arr)[0, j])
        # choose concentrations satisfying [O][OH]/([H][O2]) = Kc
        C = np.full((1, jetsurf.n_species), 1e-30)
        cH, cO2, cO = 1e-4, 2e-4, 3e-4
        cOH = np.exp(lnKc) * cH * cO2 / cO
        C[0, jetsurf.species_index("H")] = cH
        C[0, jetsurf.species_index("O2")] = cO2
        C[0, jetsurf.species_index("O")] = cO
        C[0, jetsurf.species_index("OH")] = cOH
        Rf, Rr = rates_of_progress(T, jnp.array([1e5]), jnp.asarray(C), arr)
        assert np.isclose(float(Rf[0, j]), float(Rr[0, j]), rtol=1e-10)

    def test_jacobian_matches_jvp(self, jetsurf):
        """Analytic Jacobian columns vs exact forward-mode jvp through wdot."""
        import jax

        arr = to_device_arrays(jetsurf)
        mech = jetsurf
        Y = jnp.asarray(_feed_Y(mech))
        T = jnp.array([1100.0, 1000.0])
        P = jnp.array([2e5, 1e5])
        C = nasa7.concentrations(T, P, jnp.broadcast_to(Y, (2, mech.n_species)), arr.mw)
        # seed small radical concentrations so derivative terms are active
        C = C + 1e-9
        w, J = wdot_and_jacobian(T, P, C, arr)
        rng = np.random.default_rng(0)
        cols = list(rng.choice(mech.n_species, size=6, replace=False))
        cols.append(mech.species_index("NC6H14"))
        f = lambda c: wdot(T, P, c, arr)
        for i in cols:
            tangent = jnp.zeros_like(C).at[:, i].set(1.0)
            _, exact = jax.jvp(f, (C,), (tangent,))
            Jcol = np.asarray(J[:, :, i])
            denom = np.abs(np.asarray(exact)).max() + 1e-30
            assert np.abs(Jcol - np.asarray(exact)).max() / denom < 1e-6, (
                mech.species_names[i]
            )
