"""Device-resident mechanism arrays (a jax pytree) built from a parsed Mechanism.

The TPU-first layout decision: stoichiometry is kept DENSE as (nr, ns) matrices so
rate-of-progress and production-rate contractions are MXU matmuls; the largest case
(NUIGMech1.1: 5964 x 924) is ~22 MB in f32 -- far below HBM limits and easily tiled
by XLA. Sparse gather/scatter formulations (the natural CPU choice) would run on the
VPU and lose badly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .parser import KIND_THREE_BODY, Mechanism


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MechanismArrays:
    """All mechanism data needed by the jit kinetics kernels, as jnp arrays."""

    # species
    mw: jax.Array  # (ns,)
    composition: jax.Array  # (ns, ne)
    nasa_coeffs: jax.Array  # (ns, 2, 7)
    nasa_tmid: jax.Array  # (ns,)

    # reactions
    nu_r: jax.Array  # (nr, ns)
    nu_p: jax.Array  # (nr, ns)
    nu_net: jax.Array  # (nr, ns)
    delta_n: jax.Array  # (nr,) sum(nu_p) - sum(nu_r)
    lnA: jax.Array  # (nr,)
    sgnA: jax.Array  # (nr,)
    beta: jax.Array  # (nr,)
    EaR: jax.Array  # (nr,)
    reversible: jax.Array  # (nr,) float (1.0 / 0.0)
    ln_tb_mask: jax.Array  # (nr,) 1.0 where the reaction carries a third-body factor

    # three-body
    tb_idx: jax.Array  # (n_tb,) int32
    tb_eff: jax.Array  # (n_tb, ns)

    # falloff
    fo_idx: jax.Array  # (n_fo,) int32
    fo_eff: jax.Array  # (n_fo, ns)
    fo_low: jax.Array  # (n_fo, 3)
    fo_troe: jax.Array  # (n_fo, 4)
    fo_is_troe: jax.Array  # (n_fo,) float
    fo_troe_has_t2: jax.Array  # (n_fo,) float

    # PLOG
    plog_idx: jax.Array  # (n_plog,) int32
    plog_lnP: jax.Array  # (n_plog, L)
    plog_nlevels: jax.Array  # (n_plog,) int32
    plog_lnA: jax.Array  # (n_plog, L, Tm)
    plog_sgnA: jax.Array  # (n_plog, L, Tm)
    plog_beta: jax.Array  # (n_plog, L, Tm)
    plog_EaR: jax.Array  # (n_plog, L, Tm)

    @property
    def n_species(self) -> int:
        return self.mw.shape[0]

    @property
    def n_reactions(self) -> int:
        return self.lnA.shape[0]

    @property
    def dtype(self):
        return self.lnA.dtype


def to_device_arrays(mech: Mechanism, dtype=jnp.float64) -> MechanismArrays:
    """Upload a parsed Mechanism as a MechanismArrays pytree in `dtype`.

    `dtype=jnp.float64` requires jax_enable_x64; pass jnp.float32 for the
    speed-oriented TPU path.
    """
    f = partial(jnp.asarray, dtype=dtype)
    i = partial(jnp.asarray, dtype=jnp.int32)
    ln_tb_mask = np.zeros(mech.n_reactions)
    ln_tb_mask[mech.rxn_kind == KIND_THREE_BODY] = 1.0
    # guard -inf lnA (A == 0 rows) with a large negative finite value: exp() still
    # underflows to zero but -inf would poison 0*inf products in f32 matmuls
    lnA = np.where(np.isfinite(mech.lnA), mech.lnA, -1e4)
    plog_lnA = np.where(np.isfinite(mech.plog_lnA), mech.plog_lnA, -1e4)
    return MechanismArrays(
        mw=f(mech.molecular_weights),
        composition=f(mech.composition),
        nasa_coeffs=f(mech.nasa_coeffs),
        nasa_tmid=f(mech.nasa_tmid),
        nu_r=f(mech.nu_r),
        nu_p=f(mech.nu_p),
        nu_net=f(mech.nu_p - mech.nu_r),
        delta_n=f((mech.nu_p - mech.nu_r).sum(axis=1)),
        lnA=f(lnA),
        sgnA=f(mech.sgnA),
        beta=f(mech.beta),
        EaR=f(mech.EaR),
        reversible=f(mech.reversible.astype(np.float64)),
        ln_tb_mask=f(ln_tb_mask),
        tb_idx=i(mech.tb_idx),
        tb_eff=f(mech.tb_eff),
        fo_idx=i(mech.fo_idx),
        fo_eff=f(mech.fo_eff),
        fo_low=f(mech.fo_low),
        fo_troe=f(mech.fo_troe),
        fo_is_troe=f(mech.fo_is_troe.astype(np.float64)),
        fo_troe_has_t2=f(mech.fo_troe_has_t2.astype(np.float64)),
        plog_idx=i(mech.plog_idx),
        plog_lnP=f(mech.plog_lnP),
        plog_nlevels=i(mech.plog_nlevels),
        plog_lnA=f(plog_lnA),
        plog_sgnA=f(mech.plog_sgnA),
        plog_beta=f(mech.plog_beta),
        plog_EaR=f(mech.plog_EaR),
    )
