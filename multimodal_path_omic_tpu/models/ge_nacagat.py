"""GE-NaCAGaT — WSI-only gene-expression-class model, TPU-native.

Re-design of the reference model (reference:
models/ge_nacagat/ge_nacagat.py:9-75). Despite its name the reference contains
no pre-gating/CAG blocks — it is plain self-attention (stock MHA, 1 head,
Q=K=V=H_bag, ge_nacagat.py:27,49) -> 2-layer path transformer -> gated MIL
pooling -> 3-class classifier with ``Y = softmax(logits)``.

This is the worst-case memory path in the reference: the M x M self-attention
matrix over up to ~24k patches. Here both the self-attention and the path
transformer take the bag mask, and with ``use_pallas`` the M x M matrix is
never materialized (flash kernel); the full map is only emitted when
``need_attention`` is requested (export path, ge_nacagat.py:70).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn
import jax
import jax.numpy as jnp

from multimodal_path_omic_tpu.models.common import MODEL_SIZES
from multimodal_path_omic_tpu.ops.attention import MultiheadAttention
from multimodal_path_omic_tpu.ops.blocks import GatedMILPool, WSIEncoder
from multimodal_path_omic_tpu.ops.layers import TorchLinear
from multimodal_path_omic_tpu.ops.transformer import TransformerEncoder


class GENaCAGaT(nn.Module):
    model_size: str = "medium"
    n_classes: int = 3
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    # Mesh with a 'seq' axis > 1: self-attention and the path transformer run
    # ring attention over the sharded patch axis (parallel/ring.py) — for
    # bags that exceed one chip.
    ring_mesh: Any = None

    @nn.compact
    def __call__(
        self,
        wsi: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        need_attention: bool = False,
        wsi_scale=None,
    ):
        d1, d2 = MODEL_SIZES[self.model_size]

        h_bag = WSIEncoder(dim=d1, dropout_rate=self.dropout_rate, dtype=self.dtype, name="H")(
            wsi, deterministic=deterministic, wsi_scale=wsi_scale
        )

        # Self-attention over the patch bag (ge_nacagat.py:27, 49)
        h_attn, a_attn = MultiheadAttention(
            embed_dim=d2,
            num_heads=1,
            dropout_rate=0.0,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            ring_mesh=self.ring_mesh,
            name="self_attention",
        )(
            h_bag,
            h_bag,
            h_bag,
            mask,
            need_weights=need_attention,
            deterministic=deterministic,
        )

        path_trans = TransformerEncoder(
            d_model=d2,
            num_layers=2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            ring_mesh=self.ring_mesh,
            name="path_transformer",
        )(h_attn, mask, deterministic=deterministic)

        h_path, a_path = GatedMILPool(
            dim=d2, dropout_rate=self.dropout_rate, dtype=self.dtype,
            use_pallas=self.use_pallas, ring_mesh=self.ring_mesh,
            name="path_pool",
        )(path_trans, mask, deterministic=deterministic)

        logits = TorchLinear(self.n_classes, dtype=self.dtype, name="classifier")(h_path)
        # f32 head regardless of compute dtype (see models/common.survival_head)
        logits = logits.astype(jnp.float32)
        # faithful to F.softmax(logits) with no dim on the class vector
        # (ge_nacagat.py:68)
        y = jax.nn.softmax(logits, axis=-1)
        return y, {"attn": a_attn, "path": a_path}
