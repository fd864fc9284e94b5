"""Masked flash self-attention via JAX's production Pallas TPU kernel.

The GE-NaCAGaT path runs full M x M self-attention over patch bags (reference:
ge_nacagat.py:49) and again inside its 2-layer path transformer — the
reference materializes M x M (1.6 GB fp32 at M = 20k) and OOMs long before the
24k-patch bags in BASELINE.md. Here the O(M^2) score matrix is never
materialized: ``jax.experimental.pallas.ops.tpu.flash_attention`` streams K/V
tiles with an online softmax and a flash backward (custom_vjp), and the bag
validity mask rides in as segment ids (pad patches get segment 0, valid get
segment 1 — cross-segment pairs are masked).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _library():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def supported(q, k, v) -> bool:
    """Library-kernel eligibility: TPU backend, flash-friendly shapes."""
    if jax.devices()[0].platform != "tpu":
        return False
    b, h, n, d = q.shape
    m = k.shape[2]
    if n != m:  # self-attention shapes only on this path
        return False
    if n % 128 != 0:
        return False
    # head_dim need not be 128-aligned (the kernel handles e.g. 32 for the
    # 8-head transformer layers); 8-lane alignment is enough
    if d % 8 != 0:
        return False
    return True


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """q, k, v: [B, H, L, D]; key_mask: [B, L] bool (True = valid patch)."""
    fa = _library()
    b, h, n, d = q.shape
    if sm_scale is None:
        sm_scale = 1.0 / (d**0.5)
    segment_ids = None
    if key_mask is not None:
        seg = key_mask.astype(jnp.int32)  # pad -> 0, valid -> 1
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    # Swept on v5e at the GE transformer shape (M=16k, 8 heads, dh=32):
    # 512/512/512 beats the 128-default by ~4.9x and 512/512/128 by ~1.35x
    # (see ROADMAP "tune flash block sizes" — done). block_q_dkv=512 re-swept
    # round 2 on the full GE train step: ~3% over 128, no VMEM pressure.
    # The library kernel requires block | n: custom buckets like 768 or 4864
    # (supported() admits any multiple of 128) take the largest dividing
    # block instead of tripping its divisibility ValueError at trace time.
    block = min(512, n)
    while n % block != 0:
        block //= 2
    sizes = fa.BlockSizes(
        block_q=block,
        block_k_major=block,
        block_k=block,
        block_b=1,
        block_q_major_dkv=block,
        block_k_major_dkv=block,
        block_k_dkv=block,
        block_q_dkv=block,
        block_k_major_dq=block,
        block_k_dq=block,
        block_q_dq=block,
    )
    return fa.flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=sm_scale, block_sizes=sizes
    )
