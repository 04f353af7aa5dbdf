#!/bin/bash
# Capture the OFFICIAL bench config's XLA cache entries into
# benchmarks/bench_cache/ for check-in, so a fresh VM's first driver bench
# run loads the ~200 s NUIG PFR graph (and the train-bench graph) from the
# repo instead of compiling it (VERDICT r3 next-step #7).
#
# Compiles into a scratch cache dir to isolate exactly the entries the
# default config needs (the shared /root/.cache/jax_compile holds ~100
# entries / 385 MB of A/B-experiment graphs we must not check in).
#
# Usage: nohup bash scripts/capture_bench_cache.sh > /tmp/capture_cache.log 2>&1 &
set -eu
LOCK=/tmp/hexpyro_tpu_queue.lock
cd /root/repo
until mkdir "$LOCK" 2>/dev/null; do sleep 60; done
trap 'rmdir "$LOCK"' EXIT

SCRATCH=/tmp/bench_cache_capture
rm -rf "$SCRATCH"
mkdir -p "$SCRATCH"
# bench.py seeds the scratch from benchmarks/bench_cache first; start from a
# truly empty seed so the captured set is exactly what a cold run compiles
HEXPYRO_XLA_CACHE="$SCRATCH" python bench.py --warm
mkdir -p benchmarks/bench_cache
cp "$SCRATCH"/* benchmarks/bench_cache/
du -sh benchmarks/bench_cache
ls -la benchmarks/bench_cache
echo "=== capture complete ($(date +%T)) -- review size, then git add"
