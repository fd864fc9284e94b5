"""NaCAGaT training throughput: fused pre-gated kernel vs XLA einsum path.

The round-1 verdict's top item: the pre-gated Pallas kernel existed but real
NaCAGaT training never dispatched it (the model always materialized the
attention map). This benchmark measures the NOW-WIRED path: full NaCAGaT
train steps (ces and cesar, attention dropout 0.25 active — the reference's
training config, nacagat/main.py) with use_pallas on/off across bag sizes.

Usage: python benchmarks/bench_nacagat.py  (needs the TPU)
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OMIC_SIZES = [100, 200, 300, 400, 500, 600]


def bench(loss_name: str, m: int, batch_size: int, use_pallas: bool,
          n_steps: int = 50, windows: int = 4):
    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.train.loop import TrainState, make_train_step
    from multimodal_path_omic_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    mask = np.zeros((batch_size, m), bool)
    mask[:, : int(m * 0.97)] = True
    batch = {
        "wsi": jnp.asarray(rng.normal(size=(batch_size, m, 1024)).astype(np.float32)),
        "mask": jnp.asarray(mask),
        "omics": [
            jnp.asarray(rng.normal(size=(batch_size, s)).astype(np.float32))
            for s in OMIC_SIZES
        ],
        "label": jnp.asarray(rng.integers(0, 4, batch_size).astype(np.int32)),
        "censorship": jnp.asarray(rng.integers(0, 2, batch_size).astype(np.float32)),
        "survival_months": jnp.asarray(
            rng.uniform(1, 100, batch_size).astype(np.float32)
        ),
        "weight": jnp.ones((batch_size,), jnp.float32),
    }

    model = NaCAGaT(
        n_signatures=len(OMIC_SIZES), model_size="medium", use_pallas=use_pallas
    )
    # low lr: hundreds of steps refitting one random batch otherwise drive
    # survs to exactly 1.0, where the (reference-faithful) unclamped
    # log(1 - S) term NaNs — a workload artifact, not a timing difference
    optimizer = make_optimizer("adam", 1e-5, 1e-5)
    params = jax.jit(
        lambda r: model.init(r, batch["wsi"], batch["omics"], batch["mask"])
    )(jax.random.key(0))["params"]
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        rng=jax.random.key(1),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(model, loss_name, optimizer, donate_state=True)

    state, metrics = step(state, batch)
    float(metrics.loss)  # hard sync (see bench.py note on tunneled backends)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics.loss)

    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(metrics.loss)
        dt = time.perf_counter() - t0
        best = max(best, n_steps * batch_size / dt)
    return best, float(metrics.loss)


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    configs = [
        # (loss, M, batch, steps)
        ("ces", 512, 32, 100),
        ("ces", 4096, 8, 50),
        ("ces", 8192, 4, 50),
        ("cesar", 4096, 8, 50),
        ("cesar", 8192, 4, 50),
    ]
    for loss_name, m, b, n in configs:
        row = {"model": "nacagat", "loss": loss_name, "M": m, "batch": b}
        for use_pallas in (False, True):
            bags, lossv = bench(loss_name, m, b, use_pallas, n_steps=n)
            row["pallas" if use_pallas else "xla"] = round(bags, 1)
            assert np.isfinite(lossv)
        row["speedup"] = round(row["pallas"] / row["xla"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
