#!/usr/bin/env python
"""Measure CRNN training step cost + max_steps_per_interval sensitivity.

Loads the flagship 800-case dataset, evaluates batch_loss at a fixed random
parameter vector under different max_steps_per_interval budgets, and times
jitted loss+grad steps at several batch sizes on the selected platform.

Run: HEXPYRO_PLATFORM=cpu python scripts/crnn_probe_timing.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("HEXPYRO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HEXPYRO_PLATFORM"])
jax.config.update("jax_default_matmul_precision", "highest")
cache = "/root/.cache/jax_compile"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)

import jax.numpy as jnp
import numpy as np

from hexpyro.pipeline.stages import _dataset_paths
from hexpyro.pipeline.config import PipelineConfig
from hexpyro.surrogate.crnn import config_for, init_parameters
from hexpyro.training import crnn_trainer as ct

cfg = PipelineConfig(mechanism="JetSurf", n_cases=800, out_root="runs/flagship")
ds = ct.load_crnn_dataset(_dataset_paths(cfg))
print("dataset:", ds.tsteps.shape, ds.ylabel.shape, ds.Tlist.dtype)

ccfg = config_for("JetSurf")
p0 = init_parameters(0, ccfg)
tcfg = ct.CRNNTrainConfig()

tr_idx, va_idx, _ = ct.make_splits(800)
f32 = os.environ.get("HEXPYRO_TRAIN_DTYPE", "f32") == "f32"
dt = np.float32 if f32 else np.float64
sub = lambda idx: tuple(
    jnp.asarray(getattr(ds, k)[idx], dt)
    for k in ("tsteps", "Tlist", "u0", "ylabel", "yscale")
)

# 1. max_spi sensitivity of the loss at p0 (valid split)
vb = sub(va_idx)
for spi in (8, 4, 2, 1):
    loss = ct.batch_loss(
        jnp.asarray(p0, dt), ccfg, *vb,
        ct.CRNNTrainConfig(max_steps_per_interval=spi),
    )
    print(f"max_spi={spi}: valid loss at p0 = {float(loss):.8f}")

# 2. loss+grad step timing at several batch sizes
for B in (8, 32, 64):
    b = sub(tr_idx[:B])
    tc = ct.CRNNTrainConfig(max_steps_per_interval=int(os.environ.get("SPI", 8)))

    @jax.jit
    def lg(p):
        return jax.value_and_grad(ct.batch_loss)(p, ccfg, *b, tc)

    p = jnp.asarray(p0, dt)
    t0 = time.time()
    l, g = jax.block_until_ready(lg(p))
    t_compile = time.time() - t0
    t0 = time.time()
    n = 3
    for _ in range(n):
        l, g = jax.block_until_ready(lg(p))
    t_step = (time.time() - t0) / n
    print(f"B={B}: compile {t_compile:.1f}s step {t_step * 1e3:.0f}ms "
          f"loss {float(l):.6f} |g| {float(jnp.linalg.norm(g)):.3g}")
