"""Interleaved A/B of device-cache dtypes (f32 vs int8) on the cached train
step — one process, alternating windows, best-of-N (the dev chip is
time-shared; sequential runs confound contention with the code change).

Prints one JSON line with best-window ms/step for each dtype and the ratio.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, M, D = 32, 512, 1024
OMIC_SIZES = [100, 200, 300, 400, 500, 600]
N_BAGS = 256
STEPS = 20  # per window
WINDOWS = 6


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/tmp/bench_e2e_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.data.quant import quantize_bag_int8
    from multimodal_path_omic_tpu.models import MCAT
    from multimodal_path_omic_tpu.train.loop import (
        TrainState,
        make_cached_train_step,
    )
    from multimodal_path_omic_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    wsi = rng.normal(size=(N_BAGS, M, D)).astype(np.float32)
    mask = np.ones((N_BAGS, M), bool)
    q, scale = quantize_bag_int8(wsi)
    table = {
        "label": jnp.asarray(rng.integers(0, 4, N_BAGS).astype(np.int32)),
        "omics_packed": jnp.asarray(
            rng.normal(size=(N_BAGS, sum(OMIC_SIZES))).astype(np.float32)
        ),
        "censorship": jnp.asarray(rng.integers(0, 2, N_BAGS).astype(np.float32)),
        "survival_months": jnp.asarray(rng.uniform(1, 100, N_BAGS).astype(np.float32)),
    }
    cache_f32 = dict(wsi=jnp.asarray(wsi), mask=jnp.asarray(mask), **table)
    cache_i8 = dict(
        wsi=jnp.asarray(q), wsi_scale=jnp.asarray(scale),
        mask=jnp.asarray(mask), **table,
    )

    model = MCAT(n_signatures=len(OMIC_SIZES), model_size="medium", use_pallas=True)
    optimizer = make_optimizer("adam", 2e-4, 1e-5)
    ex_w = jnp.asarray(wsi[:B])
    ex_o = [jnp.zeros((B, s), jnp.float32) for s in OMIC_SIZES]
    params = jax.jit(lambda r: model.init(r, ex_w, ex_o, jnp.asarray(mask[:B])))(
        jax.random.key(0)
    )["params"]

    def fresh_state():
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            rng=jax.random.key(1),
            step=jnp.zeros((), jnp.int32),
        )

    step = make_cached_train_step(
        model, "ces", optimizer, omic_sizes=tuple(OMIC_SIZES),
        donate_state=False, multi=False,
    )
    metas = []
    for i in range(STEPS):
        rows = rng.integers(0, N_BAGS, B).astype(np.int32)
        metas.append(
            {"pos": rows, "row": rows, "weight": np.ones((B,), np.float32)}
        )

    def window(cache, state):
        t0 = time.perf_counter()
        for m in metas:
            state, met = step(state, cache, m)
        float(met.loss)  # hard sync (device_get) on the chained final step
        return (time.perf_counter() - t0) / STEPS * 1000, state

    # compile both
    s32, s8 = fresh_state(), fresh_state()
    _, s32 = window(cache_f32, s32)
    _, s8 = window(cache_i8, s8)

    # Interleaving defends against time-share drift but pays the backend's
    # program-switch cost in both arms (biases the ratio toward 1.0); the
    # reported parity is a lower bound on the single-program behavior — see
    # bench_nacagat.py for the same documented tradeoff.
    best32, best8 = np.inf, np.inf
    for _ in range(WINDOWS):
        ms, s32 = window(cache_f32, s32)
        best32 = min(best32, ms)
        ms, s8 = window(cache_i8, s8)
        best8 = min(best8, ms)

    print(
        json.dumps(
            {
                "metric": "cached_step_ms",
                "f32_ms": round(best32, 3),
                "int8_ms": round(best8, 3),
                "int8_over_f32": round(best8 / best32, 3),
                "B": B, "M": M, "steps_per_window": STEPS, "windows": WINDOWS,
            }
        )
    )


if __name__ == "__main__":
    main()
