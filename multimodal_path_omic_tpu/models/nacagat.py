"""NaCAGaT — Narrow Contextual Attention Gate Transformer, TPU-native.

Re-design of the reference model (reference: models/nacagat/nacagat.py:9-141).
Identical skeleton to MCAT except the co-attention module is the pre-gated
contextual attention (nacagat.py:44, 93): scores multiplied by
P = (tanh(Q)tanh(K)^T + 1)/2 before softmax, CAG residual added, attention
weights always returned (the cesar loss consumes them,
nacagat/main.py:49-50).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from flax import linen as nn
import jax.numpy as jnp

from multimodal_path_omic_tpu.models.common import MODEL_SIZES, SurvivalOutput, survival_head
from multimodal_path_omic_tpu.ops.attention import PreGatingContextualAttention
from multimodal_path_omic_tpu.ops.blocks import GatedMILPool, OmicEncoderStack, WSIEncoder
from multimodal_path_omic_tpu.ops.fusion import make_fusion
from multimodal_path_omic_tpu.ops.layers import TorchLinear
from multimodal_path_omic_tpu.ops.transformer import TransformerEncoder

def _branch_pair(module_cls, name, **kwargs):
    """Two independent branches (path/omic) executed as ONE vmapped module
    over stacked params — halves the token-side small-op count vs running
    the branches sequentially (they are tiny [B, 6, D] tensors)."""
    from flax import linen as nn

    return nn.vmap(
        module_cls,
        in_axes=(0, None, None),
        out_axes=0,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        methods=["__call__"],
    )(name=name, **kwargs)


class NaCAGaT(nn.Module):
    n_signatures: int
    model_size: str = "medium"
    n_classes: int = 4
    dropout_rate: float = 0.25
    fusion: str = "concat"
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    # Mesh with a 'seq' axis > 1: the patch axis of K/V is sharded; the
    # co-attention merges shard-local softmax stats (parallel/ring.py)
    ring_mesh: Any = None
    # Replicate the reference's frozen-gate GatedConcatFusion bug
    bug_compat: bool = False

    @nn.compact
    def __call__(
        self,
        wsi: jnp.ndarray,
        omics: Sequence[jnp.ndarray],
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        need_attention=True,
        wsi_scale=None,
    ) -> SurvivalOutput:
        """``need_attention``: True returns the full co-attention map under
        ``attention['coattn']`` (the reference ALWAYS materializes it,
        nacagat.py:80 — even for ces runs that never consume it); False skips
        it so training dispatches the fused pre-gated Pallas kernel
        (ops/coattn.py); "ssq" returns the per-query weight sum-of-squares
        under ``attention['coattn_ssq']`` — all the cesar loss needs
        (loss.py:97-98), still on the fused kernel path."""
        d1, d2 = MODEL_SIZES[self.model_size]

        h_bag = WSIEncoder(dim=d1, dropout_rate=self.dropout_rate, dtype=self.dtype, name="H")(
            wsi, deterministic=deterministic, wsi_scale=wsi_scale
        )
        g_bag = OmicEncoderStack(
            n_signatures=self.n_signatures,
            dim1=d1,
            dim2=d2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="G",
        )(omics, deterministic=deterministic)

        # Pre-gated contextual co-attention, 1 head, attn dropout 0.25
        # (nacagat.py:44 -> blocks.py:51-111)
        h_coattn, a_coattn = PreGatingContextualAttention(
            embed_dim=d2,
            num_heads=1,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            ring_mesh=self.ring_mesh,
            use_pallas=self.use_pallas,
            name="co_attention",
        )(
            g_bag, h_bag, h_bag, mask,
            deterministic=deterministic,
            need_weights=need_attention if need_attention in (True, False) else "ssq",
        )

        branch_tr = _branch_pair(
            TransformerEncoder,
            "branch_transformer",
            d_model=d2,
            num_layers=2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )
        trans = branch_tr(jnp.stack([h_coattn, g_bag]), None, deterministic)

        branch_pool = _branch_pair(
            GatedMILPool,
            "branch_pool",
            dim=d2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )
        pooled, scores = branch_pool(trans, None, deterministic)
        h_path, a_path = pooled[0], scores[0]
        h_omic, a_omic = pooled[1], scores[1]

        # deterministic forwarded: bilinear fusion drops in training
        h = make_fusion(
            self.fusion, hidden=d2, output=d2, dtype=self.dtype,
            name="fusion_layer", bug_compat=self.bug_compat,
        )(h_path, h_omic, deterministic=deterministic)

        logits = TorchLinear(self.n_classes, dtype=self.dtype, name="classifier")(h)
        hazards, survs, y = survival_head(logits)
        attention = {"path": a_path, "omic": a_omic}
        if need_attention == "ssq":
            attention["coattn"] = None
            attention["coattn_ssq"] = a_coattn  # [B, N]
        else:
            attention["coattn"] = a_coattn if need_attention else None
        return SurvivalOutput(
            hazards=hazards,
            survs=survs,
            y=y,
            attention=attention,
        )
