"""Cantera-YAML mechanism compiler: YAML -> flat numpy arrays ("compiled mechanism").

This replaces the reference pipeline's dependency on the Cantera C++ library for
mechanism parsing (reference: ct.Solution(yaml) calls in
CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py:57-67).
Instead of an object graph, the output is a set of dense/padded arrays designed to be
uploaded to a TPU once and consumed by jit-compiled kinetics kernels:

  * dense stoichiometric matrices nu_r / nu_p with shape (n_reactions, n_species) --
    on TPU the rate-of-progress and species-production contractions are plain matmuls
    that run on the MXU, so sparsity is deliberately NOT exploited;
  * padded side tables for three-body efficiencies, Troe/Lindemann falloff and
    pressure-dependent-Arrhenius (PLOG) reactions, indexed into the main table.

Supported reaction types (everything present in JetSurf / LLNL / NUIGMech1.1):
  elementary (reversible & irreversible), duplicate, three-body, falloff
  (Lindemann + Troe, "(+M)" collider only), pressure-dependent-Arrhenius (PLOG).

Units: YAML files use {length: cm, quantity: mol, activation-energy: cal/mol};
everything is converted to Cantera's internal SI-kmol system (m^3, kmol, J).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import re

import numpy as np

try:  # C loader is ~20x faster on the 2.6 MB NUIG file
    from yaml import CSafeLoader as _YamlLoader
except ImportError:  # pragma: no cover
    from yaml import SafeLoader as _YamlLoader

import yaml

from ..constants import ATOMIC_WEIGHTS, CAL_TO_J, R_J_MOL

# reaction kind codes (stored in Mechanism.rxn_kind)
KIND_ELEMENTARY = 0
KIND_THREE_BODY = 1
KIND_FALLOFF = 2
KIND_PLOG = 3

_COEF_SPECIES_RE = re.compile(r"^(\d+(?:\.\d+)?|\.\d+)\s+(.*)$")
_FALLOFF_COLLIDER_RE = re.compile(r"\(\+\s*([^)]+?)\s*\)")


@dataclasses.dataclass
class Mechanism:
    """A compiled mechanism: pure numpy, ready to ship to a device.

    All rate parameters are in SI-kmol units. `lnA` holds ln|A| and `sgnA` the sign
    so duplicate reactions with negative pre-exponentials stay representable.
    """

    name: str
    species_names: list[str]
    element_names: list[str]

    # species tables
    molecular_weights: np.ndarray  # (ns,) [kg/kmol]
    composition: np.ndarray  # (ns, ne) element counts
    nasa_coeffs: np.ndarray  # (ns, 2, 7) low/high NASA7 coefficients
    nasa_tmid: np.ndarray  # (ns,)
    nasa_trange: np.ndarray  # (ns, 2) [Tlo, Thi]

    # reaction tables (base/high-pressure Arrhenius)
    equations: list[str]
    nu_r: np.ndarray  # (nr, ns) reactant stoichiometric coefficients
    nu_p: np.ndarray  # (nr, ns) product stoichiometric coefficients
    lnA: np.ndarray  # (nr,) ln|A|, SI-kmol units
    sgnA: np.ndarray  # (nr,) sign of A
    beta: np.ndarray  # (nr,) temperature exponent
    EaR: np.ndarray  # (nr,) activation energy / R  [K]
    reversible: np.ndarray  # (nr,) bool
    rxn_kind: np.ndarray  # (nr,) int8 kind codes

    # three-body side table
    tb_idx: np.ndarray  # (n_tb,) reaction indices
    tb_eff: np.ndarray  # (n_tb, ns) collider efficiencies

    # falloff side table
    fo_idx: np.ndarray  # (n_fo,)
    fo_eff: np.ndarray  # (n_fo, ns)
    fo_low: np.ndarray  # (n_fo, 3) [lnA0, beta0, EaR0] low-pressure limit
    fo_troe: np.ndarray  # (n_fo, 4) [a, T3, T1, T2]; Lindemann rows are all-zero
    fo_is_troe: np.ndarray  # (n_fo,) bool
    fo_troe_has_t2: np.ndarray  # (n_fo,) bool

    # PLOG side table, padded to (n_plog, max_levels, max_terms)
    plog_idx: np.ndarray  # (n_plog,)
    plog_lnP: np.ndarray  # (n_plog, max_levels) ln(P [Pa]); padded by repeating top level
    plog_nlevels: np.ndarray  # (n_plog,)
    plog_lnA: np.ndarray  # (n_plog, max_levels, max_terms)
    plog_sgnA: np.ndarray  # (n_plog, max_levels, max_terms) 0 on padding
    plog_beta: np.ndarray  # (n_plog, max_levels, max_terms)
    plog_EaR: np.ndarray  # (n_plog, max_levels, max_terms)

    @property
    def n_species(self) -> int:
        return len(self.species_names)

    @property
    def n_reactions(self) -> int:
        return len(self.equations)

    def species_index(self, name: str) -> int:
        return self.species_names.index(name)


def _parse_units(doc: dict) -> dict:
    units = dict(doc.get("units", {}))
    units.setdefault("length", "cm")
    units.setdefault("quantity", "mol")
    units.setdefault("activation-energy", "cal/mol")
    return units


def _ea_to_kelvin(value: float, units: dict) -> float:
    """Activation energy in YAML units -> Ea/R in Kelvin."""
    u = units["activation-energy"]
    if u == "cal/mol":
        return value * CAL_TO_J / R_J_MOL
    if u == "kcal/mol":
        return value * 1000.0 * CAL_TO_J / R_J_MOL
    if u == "J/mol":
        return value / R_J_MOL
    if u == "kJ/mol":
        return value * 1000.0 / R_J_MOL
    if u == "K":
        return value
    raise ValueError(f"unsupported activation-energy unit {u!r}")


def _conc_unit_factor(units: dict) -> float:
    """Factor converting one YAML concentration unit to SI-kmol (m^3/kmol)."""
    length = units["length"]
    quantity = units["quantity"]
    vol = {"cm": 1e-6, "m": 1.0}[length]  # m^3 per length^3
    qty = {"mol": 1e-3, "kmol": 1.0, "molec": 1.0 / 6.02214076e26}[quantity]
    return vol / qty  # (m^3/kmol) represented by one (length^3/quantity)


def _convert_A(a_yaml: float, order: float, units: dict) -> float:
    """Pre-exponential factor to SI-kmol units given overall reaction order."""
    return a_yaml * _conc_unit_factor(units) ** (order - 1.0)


def _parse_equation(eq: str) -> tuple[dict, dict, bool, str | None]:
    """Parse a Cantera reaction equation.

    Returns (reactants, products, reversible, falloff_collider) where the dicts map
    species name -> stoichiometric coefficient and falloff_collider is the species
    inside "(+ M)" (or None when absent). A bare "M" term marks a three-body
    reaction and is returned under the pseudo-species key "M".
    """
    falloff_collider = None
    m = _FALLOFF_COLLIDER_RE.search(eq)
    if m:
        falloff_collider = m.group(1).strip()
        eq = _FALLOFF_COLLIDER_RE.sub(" ", eq)

    if "<=>" in eq:
        lhs, rhs = eq.split("<=>")
        reversible = True
    elif "=>" in eq:
        lhs, rhs = eq.split("=>")
        reversible = False
    elif "=" in eq:
        lhs, rhs = eq.split("=", 1)
        reversible = True
    else:
        raise ValueError(f"cannot parse reaction equation {eq!r}")

    def parse_side(side: str) -> dict:
        out: dict[str, float] = {}
        for term in re.split(r"\s+\+\s+", side.strip()):
            term = term.strip()
            if not term:
                continue
            coef = 1.0
            cm = _COEF_SPECIES_RE.match(term)
            if cm:
                coef = float(cm.group(1))
                term = cm.group(2).strip()
            out[term] = out.get(term, 0.0) + coef
        return out

    return parse_side(lhs), parse_side(rhs), reversible, falloff_collider


def _efficiency_row(entry: dict, species_index: dict, ns: int) -> np.ndarray:
    eff = np.ones(ns)
    for name, val in entry.get("efficiencies", {}).items():
        idx = species_index.get(_species_key(name))
        # Cantera ignores efficiencies for species absent from the phase
        if idx is not None:
            eff[idx] = float(val)
    return eff


def _species_key(x) -> str:
    """Undo PyYAML's YAML-1.1 boolean resolution of bare chemical names.

    'NO' (nitric oxide) parses as False and 'ON'/'OFF'-like names as booleans
    under YAML 1.1; Cantera's yaml-cpp keeps them as strings.
    """
    if isinstance(x, str):
        return x
    if x is False:
        return "NO"
    if x is True:
        return "ON"
    raise ValueError(f"unexpected species key {x!r}")


_NOTE_BLOCK_RE = re.compile(r"^(\s*)note: [|>][+-]?\s*$")


def _strip_note_blocks(text: str) -> str:
    """Remove `note: |-` style block scalars (they may contain invalid YAML)."""
    out = []
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        m = _NOTE_BLOCK_RE.match(lines[i])
        if m:
            indent = len(m.group(1))
            i += 1
            while i < len(lines):
                line = lines[i]
                stripped = line.strip()
                if stripped and (len(line) - len(line.lstrip())) <= indent:
                    break
                i += 1
            continue
        out.append(lines[i])
        i += 1
    return "\n".join(out)


def parse_mechanism(path: str, name: str | None = None) -> Mechanism:
    """Parse a Cantera YAML mechanism file into a compiled Mechanism."""
    with open(path) as f:
        text = f.read()
    # NUIGMech1.1.yaml carries literal tabs and inconsistent indentation inside
    # `note:` block scalars -- invalid strict YAML that Cantera's yaml-cpp parser
    # tolerates. Notes are non-semantic, so drop those blocks before parsing.
    doc = yaml.load(_strip_note_blocks(text), Loader=_YamlLoader)
    units = _parse_units(doc)

    phase = doc["phases"][0]
    species_order = [_species_key(s) for s in phase["species"]]
    element_names = [str(e).upper() for e in phase["elements"]]
    species_index = {s: i for i, s in enumerate(species_order)}
    ns = len(species_order)
    ne = len(element_names)

    # ---- species ----
    spec_entries = {_species_key(s["name"]): s for s in doc["species"]}
    mw = np.zeros(ns)
    composition = np.zeros((ns, ne))
    nasa_coeffs = np.zeros((ns, 2, 7))
    nasa_tmid = np.zeros(ns)
    nasa_trange = np.zeros((ns, 2))
    for i, sname in enumerate(species_order):
        entry = spec_entries[sname]
        for el, count in entry["composition"].items():
            el_u = str(el).upper()
            composition[i, element_names.index(el_u)] = float(count)
            mw[i] += float(count) * ATOMIC_WEIGHTS[el_u]
        th = entry["thermo"]
        if th["model"] != "NASA7":
            raise ValueError(f"species {sname}: unsupported thermo model {th['model']}")
        ranges = [float(t) for t in th["temperature-ranges"]]
        data = [list(map(float, row)) for row in th["data"]]
        if len(ranges) == 2:  # single-range polynomial: duplicate it
            ranges = [ranges[0], ranges[1], ranges[1]]
            data = [data[0], data[0]]
        nasa_trange[i] = [ranges[0], ranges[2]]
        nasa_tmid[i] = ranges[1]
        nasa_coeffs[i, 0] = data[0]  # low-T
        nasa_coeffs[i, 1] = data[1]  # high-T

    # ---- reactions ----
    rxns = doc["reactions"]
    nr = len(rxns)
    equations = []
    nu_r = np.zeros((nr, ns))
    nu_p = np.zeros((nr, ns))
    lnA = np.zeros(nr)
    sgnA = np.ones(nr)
    beta = np.zeros(nr)
    EaR = np.zeros(nr)
    reversible = np.zeros(nr, dtype=bool)
    rxn_kind = np.zeros(nr, dtype=np.int8)

    tb_rows: list[tuple[int, np.ndarray]] = []
    fo_rows: list[tuple[int, np.ndarray, np.ndarray, np.ndarray, bool, bool]] = []
    plog_rows: list[tuple[int, list]] = []

    def set_arrhenius(j: int, rc: dict, order: float) -> None:
        a = _convert_A(float(rc["A"]), order, units)
        sgnA[j] = np.sign(a) if a != 0 else 0.0
        lnA[j] = np.log(abs(a)) if a != 0 else -np.inf
        beta[j] = float(rc["b"])
        EaR[j] = _ea_to_kelvin(float(rc["Ea"]), units)

    for j, rx in enumerate(rxns):
        eq = rx["equation"]
        equations.append(eq)
        reac, prod, rev, collider = _parse_equation(eq)
        reversible[j] = rev

        is_three_body = "M" in reac or "M" in prod or rx.get("type") == "three-body"
        reac.pop("M", None)
        prod.pop("M", None)
        for s, c in reac.items():
            nu_r[j, species_index[s]] += c
        for s, c in prod.items():
            nu_p[j, species_index[s]] += c
        order = float(sum(reac.values()))

        rtype = rx.get("type", "elementary")
        if rtype == "falloff" or collider is not None:
            if collider not in (None, "M"):
                raise ValueError(f"species-specific falloff collider unsupported: {eq}")
            rxn_kind[j] = KIND_FALLOFF
            set_arrhenius(j, rx["high-P-rate-constant"], order)
            low = rx["low-P-rate-constant"]
            a0 = _convert_A(float(low["A"]), order + 1.0, units)
            fo_low = np.array(
                [np.log(abs(a0)), float(low["b"]), _ea_to_kelvin(float(low["Ea"]), units)]
            )
            troe = rx.get("Troe")
            if troe is not None:
                has_t2 = "T2" in troe
                fo_troe = np.array(
                    [
                        float(troe["A"]),
                        float(troe["T3"]),
                        float(troe["T1"]),
                        float(troe.get("T2", 0.0)),
                    ]
                )
            else:
                has_t2 = False
                fo_troe = np.zeros(4)
            fo_rows.append(
                (j, _efficiency_row(rx, species_index, ns), fo_low, fo_troe,
                 troe is not None, has_t2)
            )
        elif rtype == "pressure-dependent-Arrhenius":
            rxn_kind[j] = KIND_PLOG
            # group (P, A, b, Ea) entries by pressure level; same-P entries sum
            levels: dict[float, list] = {}
            for rc in rx["rate-constants"]:
                p_pa = _pressure_to_pa(rc["P"])
                a = _convert_A(float(rc["A"]), order, units)
                levels.setdefault(p_pa, []).append(
                    (
                        np.sign(a) if a != 0 else 0.0,
                        np.log(abs(a)) if a != 0 else -np.inf,
                        float(rc["b"]),
                        _ea_to_kelvin(float(rc["Ea"]), units),
                    )
                )
            sorted_levels = sorted(levels.items())
            plog_rows.append((j, sorted_levels))
            # base entry: use the highest-pressure level's first term as a
            # placeholder; the kinetics kernel overwrites PLOG rows entirely.
            set_arrhenius(j, {"A": 1.0, "b": 0.0, "Ea": 0.0}, order)
        elif is_three_body:
            rxn_kind[j] = KIND_THREE_BODY
            set_arrhenius(j, rx["rate-constant"], order + 1.0)
            tb_rows.append((j, _efficiency_row(rx, species_index, ns)))
        else:
            if rtype not in ("elementary", None):
                raise ValueError(f"unsupported reaction type {rtype!r}: {eq}")
            rxn_kind[j] = KIND_ELEMENTARY
            set_arrhenius(j, rx["rate-constant"], order)

    # ---- pack side tables ----
    tb_idx = np.array([r[0] for r in tb_rows], dtype=np.int32)
    tb_eff = (
        np.stack([r[1] for r in tb_rows]) if tb_rows else np.zeros((0, ns))
    )
    fo_idx = np.array([r[0] for r in fo_rows], dtype=np.int32)
    if fo_rows:
        fo_eff = np.stack([r[1] for r in fo_rows])
        fo_low = np.stack([r[2] for r in fo_rows])
        fo_troe = np.stack([r[3] for r in fo_rows])
        fo_is_troe = np.array([r[4] for r in fo_rows], dtype=bool)
        fo_troe_has_t2 = np.array([r[5] for r in fo_rows], dtype=bool)
    else:
        fo_eff = np.zeros((0, ns))
        fo_low = np.zeros((0, 3))
        fo_troe = np.zeros((0, 4))
        fo_is_troe = np.zeros(0, dtype=bool)
        fo_troe_has_t2 = np.zeros(0, dtype=bool)

    n_plog = len(plog_rows)
    max_levels = max((len(r[1]) for r in plog_rows), default=1)
    max_terms = max(
        (len(terms) for _, lv in plog_rows for _, terms in lv), default=1
    )
    plog_idx = np.array([r[0] for r in plog_rows], dtype=np.int32)
    plog_lnP = np.zeros((n_plog, max_levels))
    plog_nlevels = np.zeros(n_plog, dtype=np.int32)
    plog_lnA = np.full((n_plog, max_levels, max_terms), -np.inf)
    plog_sgnA = np.zeros((n_plog, max_levels, max_terms))
    plog_beta = np.zeros((n_plog, max_levels, max_terms))
    plog_EaR = np.zeros((n_plog, max_levels, max_terms))
    for i, (_, lv) in enumerate(plog_rows):
        plog_nlevels[i] = len(lv)
        for li in range(max_levels):
            p_pa, terms = lv[min(li, len(lv) - 1)]  # pad by repeating top level
            plog_lnP[i, li] = np.log(p_pa)
            for ti, (sg, la, b, ear) in enumerate(terms):
                plog_sgnA[i, li, ti] = sg
                plog_lnA[i, li, ti] = la
                plog_beta[i, li, ti] = b
                plog_EaR[i, li, ti] = ear
        # make padded lnP strictly increasing so interpolation never divides by 0
        for li in range(1, max_levels):
            if plog_lnP[i, li] <= plog_lnP[i, li - 1]:
                plog_lnP[i, li] = plog_lnP[i, li - 1] + 1.0

    return Mechanism(
        name=name or os.path.splitext(os.path.basename(path))[0],
        species_names=species_order,
        element_names=element_names,
        molecular_weights=mw,
        composition=composition,
        nasa_coeffs=nasa_coeffs,
        nasa_tmid=nasa_tmid,
        nasa_trange=nasa_trange,
        equations=equations,
        nu_r=nu_r,
        nu_p=nu_p,
        lnA=lnA,
        sgnA=sgnA,
        beta=beta,
        EaR=EaR,
        reversible=reversible,
        rxn_kind=rxn_kind,
        tb_idx=tb_idx,
        tb_eff=tb_eff,
        fo_idx=fo_idx,
        fo_eff=fo_eff,
        fo_low=fo_low,
        fo_troe=fo_troe,
        fo_is_troe=fo_is_troe,
        fo_troe_has_t2=fo_troe_has_t2,
        plog_idx=plog_idx,
        plog_lnP=plog_lnP,
        plog_nlevels=plog_nlevels,
        plog_lnA=plog_lnA,
        plog_sgnA=plog_sgnA,
        plog_beta=plog_beta,
        plog_EaR=plog_EaR,
    )


def _pressure_to_pa(p) -> float:
    """PLOG pressure entry ('0.1 atm', '1e5 Pa', or bare number in Pa) -> Pa."""
    if isinstance(p, (int, float)):
        return float(p)
    value, unit = str(p).split()
    factor = {"atm": 101325.0, "Pa": 1.0, "bar": 1e5, "torr": 101325.0 / 760.0}[unit]
    return float(value) * factor


# ---------------------------------------------------------------------------
# compiled-mechanism disk cache (npz keyed by source file content hash)
# ---------------------------------------------------------------------------

_ARRAY_FIELDS = [
    f.name
    for f in dataclasses.fields(Mechanism)
    if f.name not in ("name", "species_names", "element_names", "equations")
]


def _cache_path(path: str, cache_dir: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read())
    return os.path.join(cache_dir, f"{os.path.basename(path)}.{h.hexdigest()[:16]}.npz")


def load_mechanism(path: str, cache_dir: str | None = None, name: str | None = None) -> Mechanism:
    """Parse a mechanism with an npz disk cache (parse once, reload in ~ms)."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "HEXPYRO_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "hexpyro")
        )
    os.makedirs(cache_dir, exist_ok=True)
    cpath = _cache_path(path, cache_dir)
    if os.path.exists(cpath):
        with np.load(cpath, allow_pickle=False) as z:
            meta = str(z["meta"])
            mname, species, elements, equations = meta.split("\x1d")
            kwargs = {k: z[k] for k in _ARRAY_FIELDS}
        return Mechanism(
            name=name or mname,
            species_names=species.split("\x1f"),
            element_names=elements.split("\x1f"),
            equations=equations.split("\x1f"),
            **kwargs,
        )
    mech = parse_mechanism(path, name=name)
    meta = "\x1d".join(
        [
            mech.name,
            "\x1f".join(mech.species_names),
            "\x1f".join(mech.element_names),
            "\x1f".join(mech.equations),
        ]
    )
    np.savez_compressed(
        cpath, meta=np.array(meta), **{k: getattr(mech, k) for k in _ARRAY_FIELDS}
    )
    return mech
