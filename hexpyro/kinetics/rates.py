"""Rate-constant evaluation: Arrhenius, three-body, Troe/Lindemann falloff, PLOG.

Everything is computed in log space over a batch axis; the functions replace
Cantera's C++ kinetics evaluators that the reference drives implicitly through
`sim.advance_to_steady_state()` (reference:
CRNN_TEMP_PRED_MODEL_TRAINING_DATASET_GENERATION/simul_data_gene_fix_chain_2D.py:154-160).

Shapes: T, P are (B,), C is (B, ns); every output is (B, nr)-shaped or gathers of it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..mechanism.arrays import MechanismArrays

_LOG10 = 2.302585092994046


def _tiny(dtype):
    """Small positive floor as an explicitly-dtyped array.

    Kept above ~1e-30 on purpose: on TPU, jax f64 is emulated with float32
    exponent range (values below ~1e-45 flush to zero), so a smaller floor
    would silently become 0 and reintroduce log(0) = -inf into matmuls.
    """
    del dtype
    return jnp.asarray(1e-30)


def ln_rate_constants(T, P, C, arr: MechanismArrays):
    """Effective forward rate constants, log-space.

    Returns (lnk, ln_tb) where `lnk` is the effective ln k_f for every reaction
    (falloff blending and PLOG interpolation applied) and `ln_tb` is the additive
    third-body log-concentration factor (zero except for three-body reactions).
    The rate of progress is then exp(lnk + ln_tb + stoichiometric activity terms).
    """
    dtype = arr.dtype
    tiny = _tiny(dtype)
    lnT = jnp.log(T)[:, None]  # (B, 1)
    invT = (1.0 / T)[:, None]

    lnk = arr.lnA + arr.beta * lnT - arr.EaR * invT  # (B, nr)

    # --- three-body factor: ln[M] with per-reaction collider efficiencies ---
    if arr.tb_idx.shape[0]:
        M_tb = C @ arr.tb_eff.T  # (B, n_tb)
        ln_tb_vals = jnp.log(jnp.maximum(M_tb, tiny))
        ln_tb = jnp.zeros_like(lnk).at[:, arr.tb_idx].set(ln_tb_vals)
    else:
        ln_tb = jnp.zeros_like(lnk)

    # --- falloff: k_eff = k_inf * Pr/(1+Pr) * F ---
    if arr.fo_idx.shape[0]:
        M_fo = jnp.maximum(C @ arr.fo_eff.T, tiny)  # (B, n_fo)
        lnk_inf = lnk[:, arr.fo_idx]
        lnk0 = arr.fo_low[:, 0] + arr.fo_low[:, 1] * lnT - arr.fo_low[:, 2] * invT
        lnPr = lnk0 - lnk_inf + jnp.log(M_fo)
        # ln(Pr/(1+Pr)) = lnPr - softplus(lnPr), numerically stable both directions
        ln_blend = lnPr - jnp.logaddexp(lnPr, jnp.zeros((), dtype))
        lnF = _ln_troe_F(T, lnPr, arr)
        lnk = lnk.at[:, arr.fo_idx].set(lnk_inf + ln_blend + lnF)

    # --- PLOG: log-log interpolation in pressure ---
    if arr.plog_idx.shape[0]:
        lnk_plog = _ln_plog_k(lnT, invT, P, arr)
        lnk = lnk.at[:, arr.plog_idx].set(lnk_plog)

    return lnk, ln_tb


def third_body_sensitivities(T, C, arr: MechanismArrays):
    """d(ln k_eff)/d(C_i) contributions from [M] for three-body/falloff reactions.

    Returns (aux_idx (n_aux,), dlnk_dC (B, n_aux, ns)) used by the analytic
    Jacobian. Three-body: dlnROP/dC_i = eff_i/M. Falloff: the pressure-blending
    term gives dln k/dlnPr = 1/(1+Pr) (the Troe-F derivative is omitted; it is a
    small correction that only affects Newton's convergence rate).
    """
    dtype = arr.dtype
    tiny = _tiny(dtype)
    parts_idx = []
    parts_val = []
    if arr.tb_idx.shape[0]:
        M_tb = jnp.maximum(C @ arr.tb_eff.T, tiny)  # (B, n_tb)
        parts_idx.append(arr.tb_idx)
        parts_val.append(arr.tb_eff[None, :, :] / M_tb[:, :, None])
    if arr.fo_idx.shape[0]:
        lnT = jnp.log(T)[:, None]
        invT = (1.0 / T)[:, None]
        M_fo = jnp.maximum(C @ arr.fo_eff.T, tiny)
        lnk_inf = (
            arr.lnA[arr.fo_idx] + arr.beta[arr.fo_idx] * lnT - arr.EaR[arr.fo_idx] * invT
        )
        lnk0 = arr.fo_low[:, 0] + arr.fo_low[:, 1] * lnT - arr.fo_low[:, 2] * invT
        lnPr = lnk0 - lnk_inf + jnp.log(M_fo)
        # d ln k_eff / d ln Pr = 1/(1+Pr) + d log10 F / d log10 Pr
        dlnk_dlnPr = jax.nn.sigmoid(-lnPr) + _dlog10F_dlog10Pr(T, lnPr, arr)
        parts_idx.append(arr.fo_idx)
        parts_val.append(
            (dlnk_dlnPr / M_fo)[:, :, None] * arr.fo_eff[None, :, :]
        )
    if not parts_idx:
        ns = arr.mw.shape[0]
        return jnp.zeros((0,), jnp.int32), jnp.zeros((C.shape[0], 0, ns), dtype)
    return jnp.concatenate(parts_idx), jnp.concatenate(parts_val, axis=1)


def _troe_terms(T, lnPr, arr: MechanismArrays):
    """Shared Troe intermediates: (log10Fcent, f1, num, den) per falloff row."""
    dtype = arr.dtype
    a = arr.fo_troe[:, 0]
    T3 = arr.fo_troe[:, 1]
    T1 = arr.fo_troe[:, 2]
    T2 = arr.fo_troe[:, 3]
    Tb = T[:, None]  # (B, 1)
    # guard T3/T1 == 0 rows (Lindemann) against division by zero
    safe_T3 = jnp.where(T3 != 0, T3, 1.0)
    safe_T1 = jnp.where(T1 != 0, T1, 1.0)
    Fcent = (
        (1.0 - a) * jnp.exp(-Tb / safe_T3)
        + a * jnp.exp(-Tb / safe_T1)
        + arr.fo_troe_has_t2 * jnp.exp(-T2 / Tb)
    )
    log10Fcent = jnp.log(jnp.maximum(Fcent, _tiny(dtype))) / _LOG10
    log10Pr = lnPr / _LOG10
    c = -0.4 - 0.67 * log10Fcent
    n = 0.75 - 1.27 * log10Fcent
    num = log10Pr + c
    den = n - 0.14 * num
    f1 = num / jnp.where(den != 0, den, 1.0)
    return log10Fcent, f1, num, den, n


def _ln_troe_F(T, lnPr, arr: MechanismArrays):
    """log F for Troe falloff; Lindemann rows return 0."""
    log10Fcent, f1, _, _, _ = _troe_terms(T, lnPr, arr)
    log10F = log10Fcent / (1.0 + f1 * f1)
    # where (not multiply): Lindemann rows can produce NaN intermediates and
    # 0 * NaN would leak through a mask multiply
    return jnp.where(arr.fo_is_troe > 0, log10F * _LOG10, 0.0)


def _dlog10F_dlog10Pr(T, lnPr, arr: MechanismArrays):
    """Analytic d(log10 F)/d(log10 Pr) for Troe rows (0 for Lindemann).

    With f1 = num/den, num = log10Pr + c, den = n - 0.14 num:
    df1/dlog10Pr = n/den^2 and dlog10F = -2 log10Fcent f1 df1 / (1+f1^2)^2.
    """
    log10Fcent, f1, _, den, n = _troe_terms(T, lnPr, arr)
    safe_den = jnp.where(den != 0, den, 1.0)
    df1 = n / (safe_den * safe_den)
    one_p = 1.0 + f1 * f1
    d = -2.0 * log10Fcent * f1 * df1 / (one_p * one_p)
    return jnp.where(arr.fo_is_troe > 0, d, 0.0)


def _ln_plog_k(lnT, invT, P, arr: MechanismArrays):
    """PLOG rate constants: sum same-pressure terms, interpolate ln k in ln P.

    Outside the tabulated range the edge level is used (Cantera semantics).
    Returns (B, n_plog).
    """
    dtype = arr.dtype
    # per-term rate constants k = sgn * exp(lnA + beta lnT - EaR/T): (B, np, L, Tm)
    expo = (
        arr.plog_lnA
        + arr.plog_beta * lnT[..., None, None]
        - arr.plog_EaR * invT[..., None, None]
    )
    k_terms = arr.plog_sgnA * jnp.exp(expo)
    k_levels = jnp.sum(k_terms, axis=-1)  # (B, np, L)
    lnk_levels = jnp.log(jnp.maximum(k_levels, _tiny(dtype)))

    lnP = jnp.log(P)[:, None]  # (B, 1)
    levels = arr.plog_lnP  # (np, L)
    n_levels = arr.plog_nlevels  # (np,)
    L = levels.shape[1]
    lnP_lo = levels[:, 0]
    lnP_hi = jnp.take_along_axis(levels, (n_levels - 1)[:, None], axis=1)[:, 0]
    lnPc = jnp.clip(lnP, lnP_lo, lnP_hi)  # (B, np)

    # bracketing level below lnPc: count levels strictly below, clamp to valid range
    below = jnp.sum(levels[None, :, :] < lnPc[:, :, None], axis=-1)  # (B, np)
    i0 = jnp.clip(below - 1, 0, L - 2)
    i0 = jnp.minimum(i0, jnp.maximum(n_levels - 2, 0))
    i1 = jnp.minimum(i0 + 1, n_levels - 1)

    lnP0 = jnp.take_along_axis(jnp.broadcast_to(levels, lnPc.shape[:1] + levels.shape), i0[..., None], axis=-1)[..., 0]
    lnP1 = jnp.take_along_axis(jnp.broadcast_to(levels, lnPc.shape[:1] + levels.shape), i1[..., None], axis=-1)[..., 0]
    lnk0 = jnp.take_along_axis(lnk_levels, i0[..., None], axis=-1)[..., 0]
    lnk1 = jnp.take_along_axis(lnk_levels, i1[..., None], axis=-1)[..., 0]

    denom = jnp.where(lnP1 > lnP0, lnP1 - lnP0, 1.0)
    w = jnp.clip((lnPc - lnP0) / denom, 0.0, 1.0)
    single = (n_levels <= 1).astype(dtype)
    return (1.0 - single) * (lnk0 + w * (lnk1 - lnk0)) + single * lnk0
