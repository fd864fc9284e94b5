"""Int8 symmetric per-patch quantization of WSI patch embeddings.

Patch embeddings are the framework's dominant byte stream: every other field
of a batch is KBs while ``wsi`` is tens of MBs (bucket x 1024 floats per bag).
Quantizing them to int8 with one scale per patch row cuts

* host->device transfer bytes 4x (``tpu.transfer_dtype: int8``),
* device-cache footprint ~4x (``tpu.cache_dtype: int8`` — 4x bigger cohorts
  fit the budget, and steady-state on-device gathers move 4x fewer bytes).

Per-row symmetric quantization keeps the error bound local: each embedding
row x is stored as ``q = round(x / s)`` with ``s = max|x| / 127``, so the
element-wise absolute error is at most ``s/2`` (~0.4% of the row's dynamic
range). Pretrained-extractor patch embeddings tolerate this easily — the
e2e planted-signal test trains to the same c-index bar as f32 (and bf16,
whose mantissa error is of the same order).

The reference has no quantization (it torch.loads f32 bags per item,
reference: dataset.py:124-126); this is a TPU-bandwidth feature.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quantize_bag_int8(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize [..., M, D] f32 embeddings to (int8 values, f32 row scales).

    Returns ``(q, scale)`` with ``q`` int8 of x's shape and ``scale`` of shape
    ``x.shape[:-1]``; all-zero rows (padding) get scale 1 and q 0 so
    dequantization is exact for them.
    """
    x = np.asarray(x, np.float32)
    amax = np.max(np.abs(x), axis=-1)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


def dequantize(q, scale, dtype=None):
    """Device-side dequantization: ``q * scale`` row-wise (works under jit;
    XLA fuses the convert+multiply into the consumer)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    return q.astype(dtype) * scale[..., None].astype(dtype)
