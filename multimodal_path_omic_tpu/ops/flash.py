"""Flash-style masked (pre-gated) attention Pallas kernel — placeholder.

Round-1 milestone order puts correctness first: until the Pallas kernel lands,
``supported`` returns False and callers fall back to the XLA einsum path in
ops/coattn.py. The kernel itself is implemented in a later milestone this
round (see SURVEY.md §7.2 step 6).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def supported(q, k, v) -> bool:
    return False


def flash_attention(q, k, v, key_mask: Optional[jnp.ndarray], *, pre_gate: bool):
    raise NotImplementedError
