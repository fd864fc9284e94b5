"""NaCAGaT lean-V A/B: V-projection reassociated off the patch axis.

Round-4 follow-up to the MCAT lean co-attention (ops/attention.py::
lean_single_head_cross_attention): NaCAGaT's PRE-GATED co-attention
(blocks.py:184-188) needs tanh(K), so its K projection cannot reassociate —
but the V projection can: ``out = (w·kv)@wv + bv·Σw`` deletes the [B, M, E]
v activation and its backward (dX, dW and a full-tensor bias-grad reduce)
from every train step. This benchmark interleaves the lean-V branch against
the MPO_NO_LEAN_ATTENTION=1 projected path (same methodology as
bench_nacagat.py: the dev chip is time-shared, so arms run interleaved
windows and keep their best — reported speedups are lower bounds).

The env flag is read at TRACE time, so each arm traces its step under its
own flag value; both compiled programs then interleave freely.

Usage: python benchmarks/bench_lean_v.py  (needs the TPU)
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
          windows: int = 6, use_pallas: bool = True):
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

    optimizer = make_optimizer("adam", 1e-5, 1e-5)
    model = NaCAGaT(
        n_signatures=len(OMIC_SIZES), model_size="medium", use_pallas=use_pallas,
    )

    arms = {}
    for arm in ("nolean", "lean"):
        os.environ["MPO_NO_LEAN_ATTENTION"] = "1" if arm == "nolean" else "0"
        try:
            # fresh params per arm: donate_state deletes the buffers on the
            # first step, so arms cannot share them (same key -> same values)
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
            state, metrics = step(state, batch)  # trace + compile under the flag
            float(metrics.loss)  # hard sync
            arms[arm] = {"step": step, "state": state, "best": 0.0}
        finally:
            os.environ.pop("MPO_NO_LEAN_ATTENTION", None)

    for _ in range(windows):
        for arm in ("nolean", "lean"):
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
    return arms["nolean"]["best"], arms["lean"]["best"]


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    configs = [
        # (loss, M, batch, steps) — M=512 is the headline-bucket shape where
        # the XLA lean-V engages; M >= 8192 exercises the kernel sumw path
        # (in-kernel dropout keeps the kernel dispatch at those M)
        ("ces", 512, 32, 100),
        ("ces", 512, 256, 40),
        ("cesar", 512, 256, 40),
        ("ces", 4096, 8, 50),
        ("cesar", 8192, 4, 40),
    ]
    if len(sys.argv) > 1:  # run a single config by index (bounded wall-clock)
        configs = [configs[int(sys.argv[1])]]
    for loss_name, m, b, n in configs:
        nolean, lean = bench(loss_name, m, b, n_steps=n)
        row = {
            "model": "nacagat", "loss": loss_name, "M": m, "batch": b,
            "nolean": round(nolean, 1), "lean_v": round(lean, 1),
            "speedup": round(lean / nolean, 3),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
