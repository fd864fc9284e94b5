"""Fused (pre-gated) attention — Pallas TPU kernel with XLA fallback.

This is the hot path of all three models (SURVEY.md §5 "long-context"):
* MCAT co-attention: N omic queries over M patch keys (N=6, M up to ~24k)
  (reference: mcat.py:97);
* NaCAGaT pre-gated co-attention: same shape, scores gated by
  P = (tanh(Q)tanh(K)^T + 1)/2 before softmax (reference: blocks.py:184-188);
* GE-NaCAGaT self-attention + its path transformer: M queries over M keys —
  the reference materializes the full M x M matrix (ge_nacagat.py:49), which
  is O(M^2) HBM; the flash-style kernel here streams K/V tiles and never
  materializes it.

The kernel computes a numerically-stable online softmax over K/V tiles with
bag-length masking. Backward recomputes score tiles (flash-attention style);
the pre-gate P doubles the score FLOPs but is computed tile-locally from the
same q/k tiles. Public entry: ``fused_attention`` (differentiable, custom VJP).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from multimodal_path_omic_tpu.ops.attention import attention_core


def _xla_fused(q, k, v, key_mask, pre_gate):
    out, _ = attention_core(
        q,
        k,
        v,
        key_mask,
        pre_gate=pre_gate,
        dropout_rate=0.0,
        deterministic=True,
        need_weights=False,
    )
    return out


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    pre_gate: bool = False,
) -> jnp.ndarray:
    """Masked (pre-gated) attention without materializing the score matrix.

    q: [B, H, N, D]; k, v: [B, H, M, D]; key_mask: [B, M] bool or None.
    Returns [B, H, N, D].
    """
    from multimodal_path_omic_tpu.ops import flash

    if flash.supported(q, k, v):
        return flash.flash_attention(q, k, v, key_mask, pre_gate=pre_gate)
    return _xla_fused(q, k, v, key_mask, pre_gate)
