"""Fused (pre-gated) co-attention kernel sweep vs the XLA einsum path.

Prints one JSON line per (M, pre_gate) configuration:
  {"metric": "coattn_fwd_bwd_ms", "m": ..., "pre_gate": ..., "pallas": ...,
   "xla": ..., "speedup": ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_path_omic_tpu.ops.attention import attention_core
    from multimodal_path_omic_tpu.ops.coattn import coattention

    B, N, D = 8, 6, 256
    rng = np.random.default_rng(0)

    def xla(q, k, v, mask, pg):
        out, _ = attention_core(
            q[:, None], k[:, None], v[:, None], mask, pre_gate=pg,
            dropout_rate=0.0, deterministic=True, need_weights=False,
        )
        return out[:, 0]

    for m in (2048, 8192, 16384, 24576):
        q = jnp.array(rng.normal(size=(B, N, D)), jnp.float32)
        k = jnp.array(rng.normal(size=(B, m, D)), jnp.float32)
        v = jnp.array(rng.normal(size=(B, m, D)), jnp.float32)
        mask = jnp.ones((B, m), bool)
        for pg in (False, True):
            f_ker = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(coattention(q, k, v, mask, pre_gate=pg) ** 2),
                    argnums=(0, 1, 2),
                )
            )
            f_xla = jax.jit(
                jax.grad(
                    lambda q, k, v: jnp.sum(xla(q, k, v, mask, pg) ** 2),
                    argnums=(0, 1, 2),
                )
            )
            times = {}
            for name, f in (("pallas", f_ker), ("xla", f_xla)):
                r = f(q, k, v)
                float(r[0][0, 0, 0])  # hard sync (block_until_ready can lie remotely)
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(10):
                        r = f(q, k, v)
                    float(r[0][0, 0, 0])
                    best = min(best, (time.perf_counter() - t0) / 10)
                times[name] = best * 1000
            print(
                json.dumps(
                    {
                        "metric": "coattn_fwd_bwd_ms",
                        "m": m,
                        "pre_gate": pg,
                        "pallas": round(times["pallas"], 3),
                        "xla": round(times["xla"], 3),
                        "speedup": round(times["xla"] / times["pallas"], 2),
                    }
                )
            )


if __name__ == "__main__":
    main()
