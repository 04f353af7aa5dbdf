#!/usr/bin/env python
"""Finish the LLNL Eon CRNN to below the reference anchors.

Reference (BASELINE.md): train 1.208e-3 / valid 1.100e-3 (242 epochs).

History of this run (see VALIDATION.md "Eon CRNN loss floor"):
- epochs 1-170: batch-2 AdamW to train ~1.42e-3 (plateau LR collapse)
- epoch ~220: temp-MLP v2 swap (600-epoch MLP, mean |dT| 0.62 -> 0.15 K)
- epochs 220-400: warm-restarted batch-8 AdamW to 1.246e-3/1.238e-3
- round 3: preconditioned full-batch L-BFGS polish (adam_param_scale) drops
  to 1.179e-3/1.156e-3 in ~75 evals -- train anchor beaten -- then stalls at
  f32 loss granularity.

This script continues with explore/polish cycles from the best saved point:
short batch-4 AdamW bursts (SGD noise hops out of the flat f32 basin) each
followed by a preconditioned polish, escalating to an f64-evaluated polish
(the f32 stall is evaluation granularity, not the true basin bottom). Every
improvement is appended to the npz history, so `parameters[-1]` / losses[-1]
only ever get better; stops the moment both anchors are beaten.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HEXPYRO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)  # f64 escalation path; f32 arrays stay f32
cache = "/root/.cache/jax_compile"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from hexpyro.pipeline import artifacts
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.pipeline.stages import _dataset_paths
from hexpyro.surrogate.crnn import config_for
from hexpyro.training import crnn_trainer as ct

ROOT = "runs/flagship_llnl_eon"
TRAIN_TARGET, VALID_TARGET = 1.19e-3, 1.09e-3

cfg = PipelineConfig(mechanism="LLNL", n_cases=800, out_root=ROOT, energy_on=True)
ds = ct.load_crnn_dataset(_dataset_paths(cfg))
params = artifacts.load_mlp_params_npz(f"{ROOT}/temp_mlp/weights_LLNL_2D.npz")
lo, hi = artifacts.load_minmax_scaler(f"{ROOT}/temp_mlp/min_max_LLNL_2D.pkl")
ds = ct.substitute_temp_profiles(ds, params, lo, hi)
ccfg = config_for("LLNL", energy_on=True)
save = f"{ROOT}/crnn/training_history_LLNL_Eon.npz"
sidecar = save + ".state.npz"

hist = ct._load_history(save)
best_tr, best_va = hist["train_loss"][-1], hist["valid_loss"][-1]
# updated_p tracks every save (including the polish ratchet, which does NOT
# refresh the optimizer sidecar); the sidecar is only used for the Adam
# second-moment preconditioner scale
with np.load(save, allow_pickle=True) as z:
    p = np.asarray(z["updated_p"])
scale = ct.adam_param_scale(sidecar)
print(f"finisher start: train {best_tr:.6e} valid {best_va:.6e}", flush=True)


def done(tr, va):
    return tr <= TRAIN_TARGET and va <= VALID_TARGET


tcfg_eval = ct.CRNNTrainConfig(max_steps_per_interval=2)
# explore/polish cycles: the polish stalls on clamp-facet kinks (observed in
# BOTH f32 and f64 -- precision is not the bottleneck); an SGD burst hops off
# the facet and the next polish descends further (cycle 0: 1.179/1.156 ->
# 1.141/1.113). Burst amplitude decays per cycle as the target nears.
for cycle in range(int(os.environ.get("HEXPYRO_FINISH_CYCLES", "5"))):
    if done(best_tr, best_va):
        break
    # 1. explore: short batch-4 AdamW burst at warm LR (no saving; the burst
    #    may transiently regress while it hops)
    burst = ct.CRNNTrainConfig(
        epochs=12, batch_size=4, learning_rate=2.4e-4 * 0.7 ** cycle,
        plateau_patience=12,
        max_steps_per_interval=2, save_path=None, resume=False,
        shuffle_seed=200 + cycle,
    )
    p_burst, h = ct.train_crnn(p, ds, ccfg, burst, verbose=True)
    # 2. descend: preconditioned polish from the burst end (f32; cheap)
    p2, tr, va, info = ct.polish_crnn(
        np.asarray(p_burst), ds, ccfg, tcfg_eval, maxiter=120, eval_chunk=80,
        stop_train=TRAIN_TARGET, stop_valid=VALID_TARGET,
        save_path=None, param_scale=scale,
    )
    print(f"cycle {cycle}: burst end {h['train_loss'][-1]:.6e}/"
          f"{h['valid_loss'][-1]:.6e} -> polish {tr:.6e}/{va:.6e} "
          f"({info['status']})", flush=True)
    if tr + va < best_tr + best_va:
        best_tr, best_va, p = tr, va, np.asarray(p2)
        # append the improvement so parameters[-1]/losses[-1] ratchet down
        _, tr2, va2, _ = ct.polish_crnn(
            p, ds, ccfg, tcfg_eval, maxiter=0, eval_chunk=80,
            save_path=save, param_scale=scale, verbose=False,
        )
        print(f"cycle {cycle}: saved best train {best_tr:.6e} "
              f"valid {best_va:.6e}", flush=True)

if not done(best_tr, best_va):
    # 3. escalate: f64-evaluated polish (the f32 stall is loss granularity;
    #    f64 restores line-search resolution at ~3-5x per-iteration cost)
    tcfg64 = ct.CRNNTrainConfig(max_steps_per_interval=2, dtype="f64")
    p2, tr, va, info = ct.polish_crnn(
        p, ds, ccfg, tcfg64, maxiter=150, eval_chunk=80,
        stop_train=TRAIN_TARGET, stop_valid=VALID_TARGET,
        save_path=None, param_scale=scale,
    )
    print(f"f64 polish: {tr:.6e}/{va:.6e} ({info['status']})", flush=True)
    # report in the standard f32 loss convention
    import jax.numpy as jnp

    tr32 = float(ct.batch_loss(
        jnp.asarray(p2, jnp.float32), ccfg,
        *(jnp.asarray(getattr(ds, k)[np.asarray(ct.make_splits(len(ds.tsteps))[0])],
                      jnp.float32)
          for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale")),
        tcfg_eval,
    ))
    va32 = float(ct.batch_loss(
        jnp.asarray(p2, jnp.float32), ccfg,
        *(jnp.asarray(getattr(ds, k)[np.asarray(ct.make_splits(len(ds.tsteps))[1])],
                      jnp.float32)
          for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale")),
        tcfg_eval,
    ))
    print(f"f64 polish at f32 eval: {tr32:.6e}/{va32:.6e}", flush=True)
    if tr32 + va32 < best_tr + best_va:
        best_tr, best_va, p = tr32, va32, np.asarray(p2)
        ct.polish_crnn(
            p, ds, ccfg, tcfg_eval, maxiter=0, eval_chunk=80,
            save_path=save, param_scale=scale, verbose=False,
        )
        print(f"saved f64-polished best {best_tr:.6e}/{best_va:.6e}", flush=True)

test = ct.test_crnn(p, ds, ccfg, tcfg_eval)
print(f"FINAL train {best_tr:.6e} valid {best_va:.6e} test {test:.6e} "
      f"targets_met={done(best_tr, best_va)}")
