"""Fused MIL-pool kernel vs XLA at GE eval shapes (interleaved A/B).

The kernel (ops/milpool.py) serves the deterministic GE eval/serving path,
where the pool runs over the full patch axis. This measures the isolated
pool op both ways at several M with hard host syncs, interleaved windows
(the dev chip is time-shared — sequential A/Bs swing ±70%).

Run on the chip:  python benchmarks/bench_milpool.py [--sizes 4096,8192,24576]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,24576")
    ap.add_argument("--dim", type=int, default=256, help="pool width (GE medium d2)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--calls", type=int, default=20, help="calls per window")
    ap.add_argument(
        "--chain",
        type=int,
        default=0,
        help="run N serialized pool iterations INSIDE one jit call "
        "(lax.scan, carry-perturbed input so XLA cannot hoist the op). "
        "On the tunneled backend the per-call dispatch RTT (~2 ms) swamps "
        "the op itself; chaining measures the in-graph cost the real GE "
        "eval step actually pays.",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.ops.milpool import (
        fused_gated_mil_pool,
        reference_gated_mil_pool,
    )

    rng = np.random.default_rng(0)
    d = h = args.dim
    w = lambda *s: jnp.asarray(rng.normal(size=s, scale=0.1), jnp.float32)
    wa, ba, wb, bb, wc, bc = w(d, h), w(h), w(d, h), w(h), w(h, 1), w(1)

    def chained(pool):
        # Serialize args.chain pool ops in one dispatch: each step's input is
        # nudged by the previous pooled value, so the scan body can't be
        # hoisted or parallelized.
        def run(x, mask):
            def step(carry, _):
                p, s = pool_fns[pool](x + carry * 1e-6, mask)
                return p[0, 0], s[0, 0]

            carry, outs = jax.lax.scan(
                step, jnp.float32(0.0), None, length=args.chain
            )
            return carry.reshape(1, 1), outs

        return run

    pool_fns = {
        "xla": lambda x, mask: reference_gated_mil_pool(
            x, mask, wa, ba, wb, bb, wc, bc
        ),
        "kernel": lambda x, mask: fused_gated_mil_pool(
            x, mask, wa, ba, wb, bb, wc, bc, interpret=False
        ),
    }

    if args.chain:
        xla_pool = jax.jit(chained("xla"))
        kernel_pool = jax.jit(chained("kernel"))
    else:
        xla_pool = jax.jit(pool_fns["xla"])
        kernel_pool = jax.jit(pool_fns["kernel"])

    rows = []
    for m in (int(s) for s in args.sizes.split(",")):
        x = jnp.asarray(
            rng.normal(size=(args.batch, m, d)).astype(np.float32)
        )
        mask = jnp.asarray(rng.random((args.batch, m)) > 0.2)
        # warmup/compile both arms, hard sync
        for fn in (xla_pool, kernel_pool):
            p, _ = fn(x, mask)
            float(p[0, 0])

        def window(fn):
            ops_per_call = max(1, args.chain)
            t0 = time.perf_counter()
            p = None
            for _ in range(args.calls):
                p, _ = fn(x, mask)
            float(p[0, 0])  # device_get sync (block_until_ready lies here)
            return (time.perf_counter() - t0) / (args.calls * ops_per_call)

        best = {"xla": float("inf"), "kernel": float("inf")}
        for _ in range(args.windows):  # interleaved windows
            best["xla"] = min(best["xla"], window(xla_pool))
            best["kernel"] = min(best["kernel"], window(kernel_pool))
        rows.append(
            {
                "m": m,
                "xla_us": round(best["xla"] * 1e6, 1),
                "kernel_us": round(best["kernel"] * 1e6, 1),
                "speedup": round(best["xla"] / best["kernel"], 3),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"metric": "milpool_kernel_vs_xla", "rows": rows}))


if __name__ == "__main__":
    main()
