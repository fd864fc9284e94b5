"""Microbenchmark: is the dominant WSI-projection matmul faster in int8?

The B=256 train step is ~62% one matmul (the 1024->256 patch projection,
fwd + dW; docs/performance.md round-4 anatomy). v5e advertises ~2x int8
MACs vs bf16, so w8a8 with i32 accumulation is the only remaining
single-op lever on hardware utilization (VERDICT r4 #6). This probes the
raw XLA matmul: [R, 1024] @ [1024, 256] as bf16xbf16->f32 vs s8xs8->s32,
plus the w8a8 epilogue (scale row/col dequant) that a real layer pays.

Run one shape per invocation window; prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=256 * 512)
    ap.add_argument("--kdim", type=int, default=1024)
    ap.add_argument("--ndim", type=int, default=256)
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    R, K, N = args.rows, args.kdim, args.ndim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.03)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    q = jnp.clip(jnp.rint(x / (jnp.max(jnp.abs(x), 1, keepdims=True) / 127)),
                 -127, 127).astype(jnp.int8)
    rs = (jnp.max(jnp.abs(x), 1) / 127).astype(jnp.float32)
    qw = jnp.clip(jnp.rint(w / (jnp.max(jnp.abs(w), 0, keepdims=True) / 127)),
                  -127, 127).astype(jnp.int8)
    cs = (jnp.max(jnp.abs(w), 0) / 127).astype(jnp.float32)

    dn = (((1,), (0,)), ((), ()))
    # CHAIN per dispatch: per-call dispatch RTT on this tunneled backend is
    # ~1.4 ms vs ~0.35 ms of matmul — one matmul per dispatch would measure
    # the tunnel. A scan of CHAIN matmuls (each consuming the previous
    # iteration's reduced scalar so XLA cannot CSE them) amortizes it away.
    CHAIN = 16

    def _chain(body):
        """Scan CHAIN matmuls in ONE dispatch. Each iteration perturbs the
        SMALL [K, N] weight operand with a scalar selected on the carry (a
        real data dependence on the previous matmul's reduction), so XLA can
        neither hoist the dot out of the loop nor CSE iterations; the
        perturbation op itself touches only ~KB-scale data."""

        def run(*arrs):
            def step(carry, i):
                y = body(carry, i, *arrs)
                return jnp.sum(y.astype(jnp.float32)) * 1e-30, None

            out, _ = lax.scan(step, jnp.zeros(()), jnp.arange(CHAIN))
            return out

        return jax.jit(run)

    def _sel8(carry, i):
        return lax.select(carry > 1e30, jnp.int8(1), (i % 3).astype(jnp.int8))

    @jax.jit
    def mm_bf16(a, b):
        return lax.dot_general(a, b, dn, preferred_element_type=jnp.float32)

    @jax.jit
    def mm_w8a8(a, b, r, c):
        acc = lax.dot_general(a, b, dn, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (r[:, None] * c[None, :])

    ch_bf16 = _chain(
        lambda carry, i, a, b: lax.dot_general(
            a,
            b + lax.select(
                carry > 1e30, jnp.bfloat16(1), (i % 3).astype(jnp.bfloat16)
            ),
            dn, preferred_element_type=jnp.float32,
        )
    )
    ch_s8 = _chain(
        lambda carry, i, a, b: lax.dot_general(
            a, b + _sel8(carry, i), dn, preferred_element_type=jnp.int32
        )
    )
    ch_w8a8 = _chain(
        lambda carry, i, a, b, r, c: lax.dot_general(
            a, b + _sel8(carry, i), dn, preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (r[:, None] * c[None, :])
    )

    # quality side-stat of the probe inputs
    exact = np.asarray(mm_bf16(x.astype(jnp.float32), w))
    approx = np.asarray(mm_w8a8(q, qw, rs, cs))
    rel = float(np.abs(approx - exact).mean() / np.abs(exact).mean())

    gflop = 2.0 * R * K * N / 1e9
    out = {"rows": R, "k": K, "n": N, "chain": CHAIN,
           "w8a8_rel_err": round(rel, 5)}
    for name, fn, arrs in (
        ("bf16", ch_bf16, (xb, wb)),
        ("s8s8", ch_s8, (q, qw)),
        ("w8a8_dequant", ch_w8a8, (q, qw, rs, cs)),
    ):
        float(fn(*arrs)[()])  # compile + hard sync
        float(fn(*arrs)[()])
        best = 0.0
        for _ in range(args.windows):
            t0 = time.perf_counter()
            y = None
            for _ in range(args.calls):
                y = fn(*arrs)
            float(y[()])
            dt = time.perf_counter() - t0
            best = max(best, args.calls * CHAIN * gflop / dt / 1000.0)
        out[f"{name}_tflops"] = round(best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
