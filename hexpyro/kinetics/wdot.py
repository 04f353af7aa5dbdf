"""Species net production rates (wdot) and their analytic Jacobians.

This is the computational heart of the ground-truth engine: the role played in the
reference by Cantera's C++ `ReactorNet` RHS + CVODES finite-difference Jacobians
(reference: simul_data_gene_fix_chain_2D.py:154-160, >99% of its wall time).

Design notes (TPU):
  * activities and production sums are dense matmuls against the (nr, ns)
    stoichiometric matrices -> MXU;
  * the concentration Jacobian is assembled analytically from the same matrices
    (J = nu_net^T diag(Rf) nu_r - nu_net^T diag(Rr) nu_p, row-scaled by 1/C), in
    batch chunks to bound the (chunk, nr, ns) intermediate;
  * third-body/falloff dependence on [M] enters the Jacobian through the
    dominant blending term (rates.third_body_sensitivities); the Troe-F
    derivative is omitted -- approximate Jacobians only affect Newton's
    convergence rate, never the converged answer, because residuals use the
    exact wdot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import GAS_CONSTANT, ONE_ATM
from ..mechanism.arrays import MechanismArrays
from ..thermo import nasa7
from .rates import ln_rate_constants, third_body_sensitivities

# max |exponent| fed to exp(): exp(85) ~ 8e36 stays finite in f32 (overflow at
# ~88) AND in this machine's TPU-emulated f64 (float32 exponent range), while
# sitting far above any physical rate of progress -- extreme transient states
# saturate instead of producing inf/NaN
_EXP_CLIP = 85.0


def _conc_floor(dtype):
    """Concentration floor [kmol/m^3], explicitly dtyped.

    1e-30 kmol/m^3 is ~1e-7 molecules/cm^3 -- chemically zero. The floor must
    stay above ~1e-38 because TPU f64 emulation has float32 exponent range
    (see rates._tiny).
    """
    del dtype
    return jnp.asarray(1e-30)


def ln_equilibrium_constants(T, arr: MechanismArrays):
    """ln Kc per reaction (concentration units), (B, nr)."""
    g = nasa7.g_RT(T, arr.nasa_tmid, arr.nasa_coeffs)  # (B, ns)
    dG = g @ arr.nu_net.T  # (B, nr)
    ln_conc0 = jnp.log(ONE_ATM / (GAS_CONSTANT * T))[:, None]  # standard conc [kmol/m^3]
    return -dG + arr.delta_n * ln_conc0


def rates_of_progress(T, P, C, arr: MechanismArrays):
    """Forward/reverse rates of progress [kmol/m^3/s].

    Returns (Rf, Rr), each (B, nr). C may contain zeros; they are floored before
    the log so padded/absent species simply produce zero rates.
    """
    dtype = arr.dtype
    lnk, ln_tb = ln_rate_constants(T, P, C, arr)
    lnC = jnp.log(jnp.maximum(C, _conc_floor(dtype)))
    ln_act_f = lnC @ arr.nu_r.T  # (B, nr)
    ln_act_r = lnC @ arr.nu_p.T
    lnKc = ln_equilibrium_constants(T, arr)

    expo_f = jnp.clip(lnk + ln_tb + ln_act_f, -_EXP_CLIP, _EXP_CLIP)
    Rf = arr.sgnA * jnp.exp(expo_f)
    # guard irreversible rows before exp: -lnKc can overflow there
    expo_r = jnp.where(
        arr.reversible > 0, lnk + ln_tb - lnKc + ln_act_r, -jnp.inf
    )
    Rr = arr.sgnA * jnp.exp(jnp.minimum(expo_r, _EXP_CLIP))
    return Rf, Rr


def wdot(T, P, C, arr: MechanismArrays):
    """Net molar production rates [kmol/m^3/s], (B, ns)."""
    Rf, Rr = rates_of_progress(T, P, C, arr)
    return (Rf - Rr) @ arr.nu_net


def wdot_and_jacobian(T, P, C, arr: MechanismArrays, chunk: int = 8,
                      precision=None):
    """wdot and its analytic concentration Jacobian d(wdot_k)/d(C_i).

    Returns (wdot (B, ns), J (B, ns, ns)). See module docstring for the
    approximation made in the third-body/falloff terms.

    `precision` sets the matmul precision of the (nr, ns)-contraction einsums
    -- the FLOP-dominant kernels of the whole refresh path. None inherits the
    global default (the solvers run under "highest": true f32 via 6 bf16 MXU
    passes). "default" (1 bf16 pass) is admissible in principle because J only
    conditions the Newton direction -- residuals always use the exact wdot --
    at the risk of extra Newton iterations from the poorer direction.
    """
    Rf, Rr = rates_of_progress(T, P, C, arr)
    w = (Rf - Rr) @ arr.nu_net
    invC = 1.0 / jnp.maximum(C, _conc_floor(arr.dtype))  # (B, ns)
    aux_idx, aux_dlnk = third_body_sensitivities(T, C, arr)  # (B, n_aux, ns)
    q_aux = (Rf - Rr)[:, aux_idx]  # (B, n_aux)
    nu_aux = arr.nu_net[aux_idx]  # (n_aux, ns)

    B = C.shape[0]
    chunk = max(1, min(chunk, B))
    pad = (-B) % chunk

    def one_chunk(args):
        Rf_c, Rr_c, invC_c, qa_c, da_c = args
        # (c, nr, ns) intermediates, contracted immediately on the MXU
        sf = Rf_c[:, :, None] * arr.nu_r  # d(ln act_f)/d(ln C) weights
        sr = Rr_c[:, :, None] * arr.nu_p
        Jc = jnp.einsum(
            "jk,cji->cki", arr.nu_net, sf - sr,
            preferred_element_type=arr.dtype, precision=precision,
        )
        Jc = Jc * invC_c[:, None, :]
        # [M]-sensitivity of three-body / falloff rates
        Jc = Jc + jnp.einsum(
            "jk,cji->cki", nu_aux, qa_c[:, :, None] * da_c,
            preferred_element_type=arr.dtype, precision=precision,
        )
        return Jc

    def padded(x, fill=0.0):
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        )

    n_chunks = (B + pad) // chunk
    args = tuple(
        padded(x, fill).reshape((n_chunks, chunk) + x.shape[1:])
        for x, fill in ((Rf, 0.0), (Rr, 0.0), (invC, 1.0), (q_aux, 0.0), (aux_dlnk, 0.0))
    )
    J = jax.lax.map(one_chunk, args)
    J = J.reshape((n_chunks * chunk, C.shape[1], C.shape[1]))[:B]
    return w, J
