"""MCAT — Multimodal Co-Attention Transformer, TPU-native.

Re-design of the reference model (reference: models/mcat/mcat.py:12-145).
Pipeline: WSI FC -> per-signature SNN omic encoders -> genomic-guided
co-attention (omic queries over patch keys/values, 1 head) -> two 2-layer
transformer encoders -> gated-attention MIL pooling per branch -> fusion ->
survival head.

TPU-first differences:
* fully batched over padded bags ``wsi [B, M, 1024]`` with validity
  ``mask [B, M]`` (the reference is batch-1, unpadded);
* co-attention can run through the fused Pallas kernel (ops/coattn.py) when
  ``use_pallas`` and weights are not needed;
* attention-map emission is a static flag (mirrors ``need_weights=inference``
  at mcat.py:97): training traces never materialize the [B, N, M] map.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from flax import linen as nn
import jax.numpy as jnp

from multimodal_path_omic_tpu.models.common import MODEL_SIZES, SurvivalOutput, survival_head
from multimodal_path_omic_tpu.ops.attention import MultiheadAttention
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


class MCAT(nn.Module):
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
        need_attention=False,
        wsi_scale: Optional[jnp.ndarray] = None,
    ) -> SurvivalOutput:
        # need_attention: True = full co-attention map (need_weights=inference
        # in the reference, mcat.py:97); False = none (fused kernel path);
        # "ssq" = per-query weight sum-of-squares for the cesar penalty.
        d1, d2 = MODEL_SIZES[self.model_size]

        # H: [B, M, d1] (mcat.py:24-29, 87)
        h_bag = WSIEncoder(dim=d1, dropout_rate=self.dropout_rate, dtype=self.dtype, name="H")(
            wsi, deterministic=deterministic, wsi_scale=wsi_scale
        )
        # G: [B, N, d2] (mcat.py:32-45, 90-92)
        g_bag = OmicEncoderStack(
            n_signatures=self.n_signatures,
            dim1=d1,
            dim2=d2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            name="G",
        )(omics, deterministic=deterministic)

        # Genomic-guided co-attention, 1 head, no dropout (mcat.py:48, 97)
        h_coattn, a_coattn = MultiheadAttention(
            embed_dim=d2,
            num_heads=1,
            dropout_rate=0.0,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            ring_mesh=self.ring_mesh,
            name="co_attention",
        )(
            g_bag,
            h_bag,
            h_bag,
            mask,
            need_weights=need_attention if need_attention in (True, False) else "ssq",
            deterministic=deterministic,
        )

        # Set-based MIL transformers (mcat.py:51-53, 60-62, 101-102)
        branch_tr = _branch_pair(
            TransformerEncoder,
            "branch_transformer",
            d_model=d2,
            num_layers=2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
        )
        trans = branch_tr(jnp.stack([h_coattn, g_bag]), None, deterministic)

        # Global attention pooling (mcat.py:105-115)
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

        # Fusion (mcat.py:69-79, 119) — deterministic forwarded: bilinear
        # fusion carries five dropout sites that must drop in training
        h = make_fusion(
            self.fusion, hidden=d2, output=d2, dtype=self.dtype,
            name="fusion_layer", bug_compat=self.bug_compat,
        )(h_path, h_omic, deterministic=deterministic)

        # Survival head (mcat.py:126-138)
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
