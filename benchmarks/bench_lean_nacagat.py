"""NaCAGaT lean step-time A/B: lean-V/lean-K vs the fully-projected path.

VERDICT r4 #1 closure measurement. Round 4 gave MCAT the lean win but
NaCAGaT's pre-gate pinned its K projection to the patch axis; round 5's
lean-K moved that projection into the fused kernel (ops/coattn.py, in-VMEM
``kv_tile @ wk`` with recompute backward) and the XLA fallback keeps the
lean-V reassociation. This A/B toggles ``MPO_NO_LEAN_ATTENTION`` between
arm traces — the honest "whole optimization on/off" comparison — with the
same interleaved-window methodology as bench_nacagat.py (best window per
arm; program-switch cost biases the ratio TOWARD 1.0, so speedups are
lower bounds).

At M=512 with the reference's attention dropout the kernel gate holds
(in-kernel PRNG dropout engages at M>=8192), so that row measures lean-V
alone; the M>=8192 rows run the full in-kernel lean-K path.

Usage: python benchmarks/bench_lean_nacagat.py  (needs the TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OMIC_SIZES = [100, 200, 300, 400, 500, 600]


def bench(loss_name: str, m: int, batch_size: int, n_steps: int = 50,
          windows: int = 6, k: int = 8):
    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.models import NaCAGaT
    from multimodal_path_omic_tpu.train.loop import (
        TrainState,
        make_multi_train_step,
    )
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
    # low lr: see bench_nacagat.py (refitting one batch NaNs the unclamped
    # reference log term otherwise — workload artifact)
    optimizer = make_optimizer("adam", 1e-5, 1e-5)
    arms = {}
    for arm in ("no_lean", "lean"):
        # MPO_NO_LEAN_ATTENTION is read at TRACE time (ops/attention.py), so
        # set it before this arm's model trace/compile
        if arm == "no_lean":
            os.environ["MPO_NO_LEAN_ATTENTION"] = "1"
        else:
            os.environ.pop("MPO_NO_LEAN_ATTENTION", None)
        model = NaCAGaT(
            n_signatures=len(OMIC_SIZES), model_size="medium", use_pallas=True,
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
        # K-step dispatch: the K=1 form measures pipelined dispatch + the
        # interleave's program-switch cost, which at these step times buries
        # a double-digit device-compute delta (first measurement of this A/B
        # read 0.95-1.03x; the K=8 rerun reads the real win)
        stacked = {
            key: (
                [jnp.broadcast_to(o, (k,) + o.shape) for o in v]
                if key == "omics"
                else jnp.broadcast_to(v, (k,) + v.shape)
            )
            for key, v in batch.items()
        }
        step = make_multi_train_step(
            model, loss_name, optimizer, donate_state=True
        )
        state, metrics = step(state, stacked)  # compile under this env
        float(metrics.loss[-1])
        arms[arm] = {"step": step, "state": state, "best": 0.0,
                     "stacked": stacked}

    for _ in range(windows):
        for arm in ("no_lean", "lean"):
            a = arms[arm]
            t0 = time.perf_counter()
            state = a["state"]
            for _ in range(n_steps):
                state, metrics = a["step"](state, a["stacked"])
            lossv = float(metrics.loss[-1])
            dt = time.perf_counter() - t0
            a["state"] = state
            a["best"] = max(a["best"], n_steps * k * batch_size / dt)
            assert np.isfinite(lossv), (arm, loss_name, m)
    return arms["no_lean"]["best"], arms["lean"]["best"]


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("BENCH_XLA_CACHE", "/tmp/bench_xla_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    configs = [
        # (loss, M, batch, steps). M=512: lean-V only (kernel dropout gate);
        # M>=8192: full in-kernel lean-K.
        ("cesar", 512, 32, 12),
        ("cesar", 8192, 4, 5),
        ("cesar", 16384, 2, 4),
    ]
    for loss_name, m, b, n in configs:
        no_lean, lean = bench(loss_name, m, b, n_steps=n)
        row = {
            "model": "nacagat", "loss": loss_name, "M": m, "batch": b,
            "no_lean": round(no_lean, 1), "lean": round(lean, 1),
            "speedup": round(lean / no_lean, 3),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
