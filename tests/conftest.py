"""Test configuration: force an 8-device virtual CPU mesh + 64-bit jax.

Must run before jax is imported anywhere (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the suite is CPU-only: mark the process as such so pipeline stages invoked
# by e2e tests never advertise themselves as the preemptible TPU holder in
# /tmp/hexpyro_tpu_job.pid (observed: a pytest run stole the advertisement
# from a live TPU training job, hiding it from bench.py's preemption)
os.environ.setdefault("HEXPYRO_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NB: this environment's jax build (axon TPU plugin) ignores JAX_PLATFORMS from
# the environment; the config update below is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the big PFR while/scan graphs take minutes to
# compile even on CPU; repeat suite runs reuse them (same dir as bench/stages;
# HEXPYRO_XLA_CACHE overrides, e.g. to measure cold-cache behavior)
_CACHE_DIR = os.environ.get("HEXPYRO_XLA_CACHE", "/root/.cache/jax_compile")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

# seed the cache from the checked-in suite cache (tests/compile_cache, ~5 MB):
# a fresh clone's first `pytest -q` paid ~40-60 min of XLA compiles for the
# two e2e stage tests alone; with the seeded entries it runs warm (~3 min).
# Entries are keyed by jax version/backend/options -- stale ones are ignored
# and recompiled, so drift is harmless. Copy-if-missing keeps the repo clean.
_SEED_DIR = os.path.join(os.path.dirname(__file__), "compile_cache")
if os.path.isdir(_SEED_DIR):
    os.makedirs(_CACHE_DIR, exist_ok=True)
    import shutil

    for _f in os.listdir(_SEED_DIR):
        _dst = os.path.join(_CACHE_DIR, _f)
        if not os.path.exists(_dst):
            shutil.copy(os.path.join(_SEED_DIR, _f), _dst)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
MECH_DIR = os.path.join(REFERENCE_ROOT, "DETAILED_KINETIC_MODEL")


@pytest.fixture(scope="session")
def jetsurf():
    from hexpyro.mechanism import load_mechanism

    return load_mechanism(os.path.join(MECH_DIR, "JetSurf.yaml"))


@pytest.fixture(scope="session")
def llnl():
    from hexpyro.mechanism import load_mechanism

    return load_mechanism(os.path.join(MECH_DIR, "LLNL.yaml"))


@pytest.fixture(scope="session")
def nuig():
    from hexpyro.mechanism import load_mechanism

    return load_mechanism(os.path.join(MECH_DIR, "NUIGMech1.1.yaml"))


@pytest.fixture(scope="session")
def jetsurf_dev(jetsurf):
    import jax.numpy as jnp

    from hexpyro.mechanism import to_device_arrays

    return to_device_arrays(jetsurf, dtype=jnp.float64)
