"""Post-LN TransformerEncoder with torch-default semantics.

The reference uses stock ``nn.TransformerEncoder(nn.TransformerEncoderLayer(
d_model, nhead=8, dim_feedforward=512, dropout=p, activation='relu'))``
(reference: mcat.py:51-53, 60-62) with torch defaults: post-norm
(norm_first=False), LayerNorm eps 1e-5, dropout applied (1) inside attention on
the weights, (2) on the attention output before the residual, (3) inside the
FF after the activation, (4) on the FF output before the residual.

Batched here: input [B, L, D] with optional key-validity mask [B, L] (the
reference never masks because it feeds unpadded batch-of-1 bags).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_path_omic_tpu.ops.attention import MultiheadAttention
from multimodal_path_omic_tpu.ops.layers import FastDropout, TorchLinear


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int = 8
    dim_feedforward: int = 512
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        attn_out, _ = MultiheadAttention(
            embed_dim=self.d_model,
            num_heads=self.nhead,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            ring_mesh=self.ring_mesh,
            name="self_attn",
        )(x, x, x, mask, need_weights=False, deterministic=deterministic)
        attn_out = FastDropout(self.dropout_rate)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn_out)

        ff = jax.nn.relu(
            TorchLinear(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        )
        ff = FastDropout(self.dropout_rate)(ff, deterministic=deterministic)
        ff = TorchLinear(self.d_model, dtype=self.dtype, name="linear2")(ff)
        ff = FastDropout(self.dropout_rate)(ff, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + ff)
        return x


class TransformerEncoder(nn.Module):
    d_model: int
    num_layers: int = 2
    nhead: int = 8
    dim_feedforward: int = 512
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                nhead=self.nhead,
                dim_feedforward=self.dim_feedforward,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                ring_mesh=self.ring_mesh,
                name=f"layer_{i}",
            )(x, mask, deterministic=deterministic)
        return x
