#!/usr/bin/env bash
# One-shot TPU revalidation after a chip outage / before a round ends.
# Each stage is independently timed out; output accumulates in
# ${OUT:-/tmp/tpu_revalidate.log}. Run from the repo root.
set -u
OUT="${OUT:-/tmp/tpu_revalidate.log}"
cd "$(dirname "$0")/.."
log() { echo "== $(date +%H:%M:%S) $*" | tee -a "$OUT"; }

log "stage 0: smoke (1-matmul)"
timeout 120 python -c "import jax,jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >>"$OUT" 2>&1 \
  || { log "SMOKE FAILED — chip still unresponsive, aborting"; exit 1; }

log "stage 1: headline bench (bench.py, BENCH_TIMEOUT guards a hang)"
timeout 1500 python bench.py >>"$OUT" 2>&1 || log "bench.py FAILED"

log "stage 2: TPU-gated kernel tests (in-kernel PRNG dropout, milpool, bundle-on-TPU)"
timeout 1800 env MPOT_TEST_TPU=1 python -m pytest tests/test_kernels_tpu.py -q -p no:cacheprovider >>"$OUT" 2>&1 \
  || log "test_kernels_tpu FAILED"

log "stage 3: milpool kernel A/B (interleaved windows)"
timeout 900 python benchmarks/bench_milpool.py >>"$OUT" 2>&1 || log "bench_milpool FAILED"

log "stage 4: serving rows — bundle + concurrency (quick)"
timeout 900 python benchmarks/bench_serving.py --sizes 500,4000 --n 8 --bundle >>"$OUT" 2>&1 \
  || log "bench_serving --bundle FAILED"
timeout 900 python benchmarks/bench_serving.py --sizes 4000 --n 16 --concurrency 4 >>"$OUT" 2>&1 \
  || log "bench_serving --concurrency FAILED"

log "done — results in $OUT"
tail -40 "$OUT"
