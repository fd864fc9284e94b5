"""Shared model plumbing: size table, survival head, output container."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# reference: mcat.py:16-21 (same table in nacagat.py:13-18, ge_nacagat.py:12-17)
MODEL_SIZES = {"small": (128, 128), "medium": (256, 256), "big": (512, 512)}


class SurvivalOutput(NamedTuple):
    """Batched model outputs (reference returns: mcat.py:140-142).

    hazards / survs / y: [B, n_classes]; attention: dict of score maps
    ('coattn' may be None when not requested, mirroring
    need_weights=inference at mcat.py:97).
    """

    hazards: jnp.ndarray
    survs: jnp.ndarray
    y: jnp.ndarray
    attention: Dict[str, Optional[jnp.ndarray]]


def survival_head(
    logits: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """logits -> (hazards, survs, Y) (reference: mcat.py:126-138).

    hazards = sigmoid(logits); survs = cumprod(1 - hazards); Y = softmax(logits).

    Always computed in f32: under bf16 compute, sigmoid saturates to exactly
    1.0 from ~0.996 up (8 mantissa bits), making the survival losses'
    log(1 - S) terms -inf. The head is [B, 4] — the upcast is free.
    """
    logits = logits.astype(jnp.float32)
    hazards = jax.nn.sigmoid(logits)
    survs = jnp.cumprod(1.0 - hazards, axis=-1)
    y = jax.nn.softmax(logits, axis=-1)
    return hazards, survs, y


def build_model(name: str, *, omic_sizes: Sequence[int] = (), model_size: str = "medium",
                fusion: str = "concat", n_classes: Optional[int] = None,
                dropout: float = 0.25, dtype=None, use_pallas: bool = False,
                ring_mesh: Any = None, bug_compat: bool = False) -> Any:
    """Model factory keyed by the reference's config ``model.name`` values."""
    from multimodal_path_omic_tpu.models.ge_nacagat import GENaCAGaT
    from multimodal_path_omic_tpu.models.mcat import MCAT
    from multimodal_path_omic_tpu.models.nacagat import NaCAGaT

    key = name.lower().replace("-", "_").replace(" ", "")
    if key in ("mcat", "multimodalcoattentiontransformer"):
        return MCAT(
            n_signatures=len(omic_sizes), model_size=model_size, fusion=fusion,
            n_classes=n_classes or 4, dropout_rate=dropout, dtype=dtype,
            use_pallas=use_pallas, ring_mesh=ring_mesh, bug_compat=bug_compat,
        )
    if key in ("nacagat", "narrowcontextualattentiongatetransformer"):
        return NaCAGaT(
            n_signatures=len(omic_sizes), model_size=model_size, fusion=fusion,
            n_classes=n_classes or 4, dropout_rate=dropout, dtype=dtype,
            use_pallas=use_pallas, ring_mesh=ring_mesh, bug_compat=bug_compat,
        )
    if key in ("ge_nacagat", "genacagat", "geneexpr_nacagat", "geneexprnacagat"):
        return GENaCAGaT(
            model_size=model_size, n_classes=n_classes or 3, dropout_rate=dropout,
            dtype=dtype, use_pallas=use_pallas, ring_mesh=ring_mesh,
        )
    raise ValueError(f"Unknown model name: {name}")
