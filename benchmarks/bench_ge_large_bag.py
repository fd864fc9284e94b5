"""GE-NaCAGaT large-bag scaling: forward + full train step across bag sizes.

The reference materializes the M x M self-attention matrix and cannot run
these sizes at all (1.6 GB fp32 per head at M=20k; ge_nacagat.py:49). Prints
one JSON line per M:
  {"metric": "ge_large_bag", "m": ..., "fwd_ms_per_bag": ...,
   "train_ms_per_step": ..., "train_bags_per_sec": ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.models import GENaCAGaT
    from multimodal_path_omic_tpu.train.loop import TrainState, make_train_step
    from multimodal_path_omic_tpu.train.optim import make_optimizer

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--compute", choices=["f32", "bf16"], default="f32",
        help="activation dtype (bf16 halves flash-attention HBM traffic; "
        "heads stay f32 inside the model either way)",
    )
    ap.add_argument("--sizes", default="4096,8192,16384,24576")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = GENaCAGaT(
        model_size="medium", use_pallas=True,
        dtype=jnp.bfloat16 if args.compute == "bf16" else None,
    )
    params = None
    opt = make_optimizer("adam", 2e-4, 1e-5)

    for m in [int(s) for s in args.sizes.split(",")]:
        b = 2
        wsi = jnp.asarray(rng.normal(size=(b, m, 1024)).astype(np.float32))
        mask = jnp.asarray(
            np.arange(m)[None, :] < rng.integers(m // 2, m, size=b)[:, None]
        )
        batch = {
            "wsi": wsi,
            "mask": mask,
            "label": jnp.asarray(rng.integers(0, 3, b).astype(np.int32)),
            "weight": jnp.ones((b,), jnp.float32),
        }
        if params is None:
            params = jax.jit(
                lambda r: model.init(r, wsi[:1, :512], mask[:1, :512])
            )(jax.random.key(0))["params"]
            state = TrainState(
                params, opt.init(params), jax.random.key(1), jnp.zeros((), jnp.int32)
            )
            step = make_train_step(model, "ce", opt, ge_mode=True, patch_budget=65536)

        # sync via device_get (float/np.asarray): block_until_ready can
        # return early on remote backends and would time dispatch only
        fwd = jax.jit(lambda p, w, msk: model.apply({"params": p}, w, msk)[0])
        y = fwd(params, wsi, mask)
        float(y[0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            y = fwd(params, wsi, mask)
            float(y[0, 0])
        fwd_ms = (time.perf_counter() - t0) / 5 / b * 1000

        state2, metrics = step(state, batch)
        float(metrics.loss)
        t0 = time.perf_counter()
        for _ in range(5):
            state2, metrics = step(state2, batch)
        float(metrics.loss)
        step_ms = (time.perf_counter() - t0) / 5 * 1000

        print(
            json.dumps(
                {
                    "metric": "ge_large_bag",
                    "m": m,
                    "fwd_ms_per_bag": round(fwd_ms, 1),
                    "train_ms_per_step": round(step_ms, 1),
                    "train_bags_per_sec": round(b / (step_ms / 1000), 2),
                }
            )
        )


if __name__ == "__main__":
    main()
