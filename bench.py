"""Headline benchmark: MCAT training throughput (fwd+bwd+update), bags/sec.

Workload per BASELINE.md: MCAT medium, 500x1024-patch bags (padded to the 512
bucket) + 6 omic signature groups [100..600], ces loss, adam — the exact
configuration of the reference's hot loop (reference: mcat/main.py:19-74),
batched the TPU way (one jitted step per effective batch of 32 bags = one
optimizer update, same sample count as the reference's grad_acc_step=32).

Baseline: the PyTorch reference on CPU in this container measured at
40.54 bags/sec (batch-1 loop, fwd+bwd with adam step every 32 bags,
torch 2.13.0+cpu, 1 thread — methodology in BASELINE.md). vs_baseline is
our bags/sec divided by that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TORCH_CPU_BAGS_PER_SEC = 40.54  # measured 2026-08-16, see BASELINE.md


def _start_watchdog(seconds: float) -> threading.Timer:
    """The tunneled dev TPU can go fully unresponsive for long stretches
    (even a 1-matmul jit hangs). A hung benchmark leaves the caller with
    nothing; an honest zero with an error field is strictly more useful.
    The budget must cover a COLD compile of the K-step scan (multi-minute,
    server-side) — override with BENCH_TIMEOUT if the cache is known-warm."""

    def fire():
        print(
            json.dumps(
                {
                    "metric": "mcat_train_bags_per_sec",
                    "value": 0.0,
                    "unit": "bags/sec",
                    "vs_baseline": 0.0,
                    "error": f"TPU unresponsive: no result within {seconds:.0f}s",
                }
            ),
            flush=True,
        )
        os._exit(17)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t

OMIC_SIZES = [100, 200, 300, 400, 500, 600]
BATCH = 32
BAG = 500
BUCKET = 512


def main():
    watchdog = _start_watchdog(float(os.environ.get("BENCH_TIMEOUT", "1200")))
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")  # fast dropout keys
    # persistent compile cache: repeat runs (and the driver's end-of-round
    # fresh process) skip the multi-minute K=32 scan compile
    cache_dir = os.environ.get("BENCH_XLA_CACHE", "/tmp/bench_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.models import MCAT
    from multimodal_path_omic_tpu.train.loop import TrainState
    from multimodal_path_omic_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    mask = np.zeros((BATCH, BUCKET), bool)
    mask[:, :BAG] = True
    # wsi feeds as bf16 — the framework's default TPU feed
    # (tpu.transfer_dtype/cache_dtype "auto"): under default matmul precision
    # the MXU consumes bf16 operands regardless, so f32 feeding only inserts
    # a whole-tensor on-device convert (profiled at ~19% of a step, round 3).
    batch = {
        "wsi": jnp.asarray(
            rng.normal(size=(BATCH, BUCKET, 1024)).astype(np.float32)
        ).astype(jnp.bfloat16),
        "mask": jnp.asarray(mask),
        "omics": [
            jnp.asarray(rng.normal(size=(BATCH, s)).astype(np.float32))
            for s in OMIC_SIZES
        ],
        "label": jnp.asarray(rng.integers(0, 4, BATCH).astype(np.int32)),
        "censorship": jnp.asarray(rng.integers(0, 2, BATCH).astype(np.float32)),
        "survival_months": jnp.asarray(
            rng.uniform(1, 100, BATCH).astype(np.float32)
        ),
        "weight": jnp.ones((BATCH,), jnp.float32),
    }

    model = MCAT(n_signatures=len(OMIC_SIZES), model_size="medium", use_pallas=True)
    optimizer = make_optimizer("adam", 2e-4, 1e-5)
    params = jax.jit(
        lambda r: model.init(r, batch["wsi"], batch["omics"], batch["mask"])
    )(jax.random.key(0))["params"]
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        rng=jax.random.key(1),
        step=jnp.zeros((), jnp.int32),
    )
    # Multi-step dispatch (train/loop.py make_multi_train_step): ONE device
    # call runs K=8 sequential 32-bag optimizer steps via lax.scan — exact
    # single-step semantics (equality-tested), amortizing per-call dispatch
    # latency (profiled at ~1.4 ms/call on this tunneled backend vs ~0.64 ms
    # of device compute per step; docs/performance.md).
    from multimodal_path_omic_tpu.train.loop import make_multi_train_step

    # K=64 measured best on this backend post lean co-attention (round 4:
    # 64.5k @ K=32, 72.3k @ K=64; K=128 only +2.4% more on 4.2 GB staging).
    # Pre-lean round 3: 41.9k @ K=8, 48.9k @ K=16, 56.0k @ K=32.
    K = int(os.environ.get("BENCH_K", "64"))
    step = make_multi_train_step(model, "ces", optimizer, donate_state=True)
    stacked = {
        k: (
            [jnp.broadcast_to(o, (K,) + o.shape) for o in v]
            if k == "omics"
            else jnp.broadcast_to(v, (K,) + v.shape)
        )
        for k, v in batch.items()
    }

    # warmup / compile. NOTE: sync via float() (device_get) — on remote/
    # tunneled backends block_until_ready can return before execution
    # completes, which would time dispatch instead of compute. The steps chain
    # through `state`, so fetching the last loss forces the whole window.
    state, metrics = step(state, stacked)
    float(metrics.loss[-1])
    for _ in range(3):
        state, metrics = step(state, stacked)
    float(metrics.loss[-1])

    # timed: best of several windows (the device may be time-shared; the best
    # window reflects the hardware, the others reflect contention)
    n_calls = 16  # x BENCH_K steps each (1024 at the default K=64)
    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, metrics = step(state, stacked)
        float(metrics.loss[-1])  # hard sync on the chained final step
        dt = time.perf_counter() - t0
        best = max(best, n_calls * K * BATCH / dt)
    bags_per_sec = best

    watchdog.cancel()
    print(
        json.dumps(
            {
                "metric": "mcat_train_bags_per_sec",
                "value": round(bags_per_sec, 1),
                "unit": "bags/sec",
                "vs_baseline": round(bags_per_sec / TORCH_CPU_BAGS_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
