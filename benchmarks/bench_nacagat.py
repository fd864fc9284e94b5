"""NaCAGaT training throughput: fused pre-gated kernel vs XLA einsum path.

The round-1 verdict's top item: the pre-gated Pallas kernel existed but real
NaCAGaT training never dispatched it (the model always materialized the
attention map). This benchmark measures the NOW-WIRED path: full NaCAGaT
train steps (ces and cesar, attention dropout 0.25 active — the reference's
training config, nacagat/main.py) with use_pallas on/off across bag sizes.

Methodology: the dev chip is time-shared with 30-50% run-to-run variance, so
the two arms run INTERLEAVED windows and each arm keeps its best window —
contention hits both arms equally. The M=512 row is a noise gauge: the kernel
only dispatches at M >= 4096, so both arms run identical code there and any
deviation from speedup=1.0 bounds the measurement noise.

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


def bench(loss_name: str, m: int, batch_size: int, n_steps: int = 50,
          windows: int = 6):
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

    # low lr: hundreds of steps refitting one random batch otherwise drive
    # survs to exactly 1.0, where the (reference-faithful) unclamped
    # log(1 - S) term NaNs — a workload artifact, not a timing difference
    optimizer = make_optimizer("adam", 1e-5, 1e-5)
    arms = {}
    for arm in ("xla", "pallas"):
        model = NaCAGaT(
            n_signatures=len(OMIC_SIZES), model_size="medium",
            use_pallas=arm == "pallas",
        )
        params = jax.jit(
            lambda r, mdl=model: mdl.init(r, batch["wsi"], batch["omics"], batch["mask"])
        )(jax.random.key(0))["params"]
        state = TrainState(
            params=params,
            opt_state=optimizer.init(params),
            rng=jax.random.key(1),
            step=jnp.zeros((), jnp.int32),
        )
        step = make_train_step(model, loss_name, optimizer, donate_state=True)
        state, metrics = step(state, batch)  # compile
        float(metrics.loss)  # hard sync (tunneled backends; see bench.py)
        arms[arm] = {"step": step, "state": state, "best": 0.0}

    # Methodology tradeoff, documented: interleaved windows defend against
    # time-share drift (sequential A/Bs on this chip swing +-70%) but pay the
    # backend's program-switch/reload cost in BOTH arms each window, biasing
    # the ratio toward 1.0 — the reported speedups are therefore LOWER bounds
    # on the steady-state (single-program) gain.
    for _ in range(windows):
        for arm in ("xla", "pallas"):
            a = arms[arm]
            t0 = time.perf_counter()
            state = a["state"]
            for _ in range(n_steps):
                state, metrics = a["step"](state, batch)
            lossv = float(metrics.loss)
            dt = time.perf_counter() - t0
            a["state"] = state
            a["best"] = max(a["best"], n_steps * batch_size / dt)
            assert np.isfinite(lossv), (arm, loss_name, m)
    return arms["xla"]["best"], arms["pallas"]["best"]


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    configs = [
        # (loss, M, batch, steps); M=512 = noise gauge (identical code paths)
        ("ces", 512, 32, 100),
        ("ces", 4096, 8, 50),
        ("ces", 8192, 4, 40),
        ("ces", 16384, 2, 30),
        ("cesar", 8192, 4, 40),
        ("cesar", 16384, 2, 30),
    ]
    for loss_name, m, b, n in configs:
        xla, pallas = bench(loss_name, m, b, n_steps=n)
        row = {
            "model": "nacagat", "loss": loss_name, "M": m, "batch": b,
            "xla": round(xla, 1), "pallas": round(pallas, 1),
            "speedup": round(pallas / xla, 3),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
