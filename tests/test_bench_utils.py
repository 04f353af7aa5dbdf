"""Unit tests for bench.py's host-side helpers (no device use)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_seed_compile_cache_copies_only_missing(tmp_path, monkeypatch):
    bench = _load_bench()
    seed = tmp_path / "repo" / "benchmarks" / "bench_cache"
    seed.mkdir(parents=True)
    (seed / "entry_a").write_bytes(b"A" * 16)
    (seed / "entry_b").write_bytes(b"B" * 16)
    cache = tmp_path / "xla_cache"
    cache.mkdir()
    (cache / "entry_a").write_bytes(b"LOCAL")  # pre-existing: must be kept

    # point the module's repo root at the fake tree
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "repo" / "bench.py")
    )
    copied = bench.seed_compile_cache(str(cache))
    assert copied == 1
    assert (cache / "entry_a").read_bytes() == b"LOCAL"  # not clobbered
    assert (cache / "entry_b").read_bytes() == b"B" * 16


def test_seed_compile_cache_no_seed_dir(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "empty" / "bench.py")
    )
    cache = tmp_path / "xla_cache2"
    assert bench.seed_compile_cache(str(cache)) == 0
    assert cache.is_dir()  # still created for jax to use


def test_pfr_flop_model_scales_with_counters():
    bench = _load_bench()

    class Opts:
        richardson_iters = 3
        ns_iters = 2

    base = bench.pfr_flop_model(
        [2.0] * 10, [1.0] * 10, [1.0] * 10, B=16, ns=100, nr=400,
        n_sys=100, opts=Opts())
    assert base["newton_iters_total"] == 20.0
    assert base["jac_refreshes_total"] == 10.0
    assert base["lu_rescues_total"] == 10.0
    doubled = bench.pfr_flop_model(
        [4.0] * 10, [1.0] * 10, [1.0] * 10, B=16, ns=100, nr=400,
        n_sys=100, opts=Opts())
    # doubling iteration counts strictly increases total FLOPs
    assert doubled["flops_total"] > base["flops_total"]
    # refreshes==rescues means every refresh is charged gate-only + LU
    split = base["flops_split"]
    assert split["lu_rescues"] > 0 and split["jacobian+ns_refresh"] > 0


def test_repeat_stats_summary():
    bench = _load_bench()
    s = bench.repeat_stats([5.0, 6.0, 16.0])
    assert s["best_s"] == 5.0
    assert s["median_s"] == 6.0
    assert abs(s["spread"] - 11.0 / 6.0) < 1e-4  # rounded to 4 decimals
    assert s["times_s"] == [5.0, 6.0, 16.0]  # original order preserved
    one = bench.repeat_stats([2.0])
    assert one["best_s"] == one["median_s"] == 2.0 and one["spread"] == 0.0


def test_cache_snapshot_filters_small_entries(tmp_path):
    bench = _load_bench()
    (tmp_path / "big-cache").write_bytes(b"x" * 1_500_000)
    (tmp_path / "small-cache").write_bytes(b"x" * 100)
    snap = bench._cache_snapshot(str(tmp_path))
    assert snap == {"big-cache": 1_500_000}
    assert bench._cache_snapshot(str(tmp_path / "missing")) == {}
