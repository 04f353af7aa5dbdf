"""Mechanism-compiler unit tests: counts, stoichiometry, units, atom balance.

Strategy per SURVEY.md section 4: species/reaction counts vs the YAML, k(T) vs
hand-computed Arrhenius values, and element conservation of every reaction.
"""

import numpy as np
import pytest

from hexpyro.constants import CAL_TO_J, R_J_MOL
from hexpyro.mechanism import parse_mechanism
from hexpyro.mechanism.parser import (
    KIND_ELEMENTARY,
    KIND_FALLOFF,
    KIND_PLOG,
    KIND_THREE_BODY,
    _parse_equation,
)

MECH_DIR = "/root/reference/DETAILED_KINETIC_MODEL"


def test_parse_equation_forms():
    r, p, rev, coll = _parse_equation("H + O2 <=> O + OH")
    assert r == {"H": 1.0, "O2": 1.0} and p == {"O": 1.0, "OH": 1.0}
    assert rev and coll is None

    r, p, rev, coll = _parse_equation("2 C3H4-A => C2H4 + C4H4")
    assert r == {"C3H4-A": 2.0} and not rev

    r, p, rev, coll = _parse_equation("H + O2 (+ M) <=> HO2 (+ M)")
    assert coll == "M" and r == {"H": 1.0, "O2": 1.0}

    r, p, rev, coll = _parse_equation("H + H + M <=> H2 + M")
    assert "M" in r and r["H"] == 2.0

    r, p, rev, coll = _parse_equation("IND + H => C6H5 + 0.5 C3H4-A + 0.5 C3H4-P")
    assert p == {"C6H5": 1.0, "C3H4-A": 0.5, "C3H4-P": 0.5}


@pytest.mark.parametrize(
    "name,n_rxn,n_fo,n_tb,n_plog",
    [("JetSurf", 2163, 387, 11, 0), ("LLNL", 4846, 35, 22, 0), ("NUIGMech1.1", 5963, 106, 24, 1010)],
)
def test_counts(name, n_rxn, n_fo, n_tb, n_plog, request):
    mech = request.getfixturevalue(
        {"JetSurf": "jetsurf", "LLNL": "llnl", "NUIGMech1.1": "nuig"}[name]
    )
    assert mech.n_reactions == n_rxn
    assert (mech.rxn_kind == KIND_FALLOFF).sum() == n_fo
    assert (mech.rxn_kind == KIND_THREE_BODY).sum() == n_tb
    assert (mech.rxn_kind == KIND_PLOG).sum() == n_plog
    assert mech.fo_idx.shape[0] == n_fo
    assert mech.plog_idx.shape[0] == n_plog


def test_species_and_weights(jetsurf):
    i_hex = jetsurf.species_index("NC6H14")
    assert abs(jetsurf.molecular_weights[i_hex] - (6 * 12.011 + 14 * 1.008)) < 1e-9
    i_h2o = jetsurf.species_index("H2O")
    assert abs(jetsurf.molecular_weights[i_h2o] - (2 * 1.008 + 15.999)) < 1e-9
    # composition row of hexane: 14 H, 6 C
    iH = jetsurf.element_names.index("H")
    iC = jetsurf.element_names.index("C")
    assert jetsurf.composition[i_hex, iH] == 14
    assert jetsurf.composition[i_hex, iC] == 6


def test_atom_balance_all_reactions(jetsurf, llnl, nuig):
    """Every reaction must conserve every element: (nu_p - nu_r) @ E == 0."""
    for mech in (jetsurf, llnl, nuig):
        resid = (mech.nu_p - mech.nu_r) @ mech.composition
        assert np.abs(resid).max() < 1e-10, f"{mech.name}: atom imbalance"


def test_arrhenius_units_reaction1(jetsurf):
    """JetSurf reaction 1: H + O2 <=> O + OH, A=2.644e16 cm^3/mol/s."""
    j = jetsurf.equations.index("H + O2 <=> O + OH")
    # bimolecular: (cm^3/mol)^1 -> (m^3/kmol)^1 is a factor 1e-3
    assert np.isclose(np.exp(jetsurf.lnA[j]), 2.644e16 * 1e-3, rtol=1e-12)
    assert jetsurf.beta[j] == -0.6707
    assert np.isclose(jetsurf.EaR[j], 1.7041e4 * CAL_TO_J / R_J_MOL, rtol=1e-12)
    assert jetsurf.reversible[j]
    assert jetsurf.rxn_kind[j] == KIND_ELEMENTARY


def test_three_body_units(jetsurf):
    """H + H + M <=> H2 + M: A=1.78e18 cm^6/mol^2/s -> factor 1e-6."""
    j = jetsurf.equations.index("H + H + M <=> H2 + M")
    assert jetsurf.rxn_kind[j] == KIND_THREE_BODY
    assert np.isclose(np.exp(jetsurf.lnA[j]), 1.78e18 * 1e-6, rtol=1e-12)
    row = jetsurf.tb_eff[list(jetsurf.tb_idx).index(j)]
    assert row[jetsurf.species_index("AR")] == 0.63
    assert row[jetsurf.species_index("CO2")] == 0.0
    assert row[jetsurf.species_index("CH4")] == 1.0  # default


def test_falloff_units_and_troe(jetsurf):
    """H + O2 (+ M) <=> HO2 (+ M): high A=5.116e12 (bimolecular), low=6.328e19."""
    j = jetsurf.equations.index("H + O2 (+ M) <=> HO2 (+ M)")
    assert jetsurf.rxn_kind[j] == KIND_FALLOFF
    fi = list(jetsurf.fo_idx).index(j)
    assert np.isclose(np.exp(jetsurf.lnA[j]), 5.116e12 * 1e-3, rtol=1e-12)
    assert np.isclose(np.exp(jetsurf.fo_low[fi, 0]), 6.328e19 * 1e-6, rtol=1e-12)
    assert jetsurf.fo_is_troe[fi]
    assert not jetsurf.fo_troe_has_t2[fi]
    assert np.isclose(jetsurf.fo_troe[fi, 0], 0.5)
    eff = jetsurf.fo_eff[fi]
    assert eff[jetsurf.species_index("H2O")] == 11.89


def test_plog_table(nuig):
    """CO + OH <=> HOCO (NUIG): 5 pressure levels in atm, sorted ascending."""
    j = nuig.equations.index("CO + OH <=> HOCO")
    assert nuig.rxn_kind[j] == KIND_PLOG
    pi = list(nuig.plog_idx).index(j)
    nlev = nuig.plog_nlevels[pi]
    assert nlev == 5
    lnP = nuig.plog_lnP[pi, :nlev]
    assert np.all(np.diff(lnP) > 0)
    assert np.isclose(np.exp(lnP[0]), 0.013158 * 101325.0, rtol=1e-6)
    # first level first term: A=1.7e15 cm^3/mol -> 1.7e12 SI (bimolecular)
    assert np.isclose(np.exp(nuig.plog_lnA[pi, 0, 0]), 1.7e15 * 1e-3, rtol=1e-12)


def test_irreversible_flags(llnl):
    rev_frac = llnl.reversible.mean()
    assert rev_frac < 0.1  # LLNL is written almost entirely as irreversible pairs
    assert (~llnl.reversible).sum() == 4626


def test_cache_roundtrip(tmp_path):
    from hexpyro.mechanism import load_mechanism

    path = f"{MECH_DIR}/JetSurf.yaml"
    m1 = load_mechanism(path, cache_dir=str(tmp_path))
    m2 = load_mechanism(path, cache_dir=str(tmp_path))  # from cache
    assert m1.species_names == m2.species_names
    assert m1.equations[:5] == m2.equations[:5]
    np.testing.assert_array_equal(m1.nu_r, m2.nu_r)
    np.testing.assert_array_equal(m1.plog_lnP, m2.plog_lnP)
    np.testing.assert_array_equal(m1.nasa_coeffs, m2.nasa_coeffs)
