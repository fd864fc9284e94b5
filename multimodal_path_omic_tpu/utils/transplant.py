"""PyTorch checkpoint transplant: reference state_dicts -> flax param trees.

Lets a user of the reference bring their trained ``.pt`` checkpoints
(saved as ``{'model_state_dict': ...}`` by the reference trainer,
reference: models/mcat/main.py:95-100) straight into this framework, and
powers the fp32 weights-transplant parity tests (BASELINE.md).

Conventions:
* torch ``Linear.weight`` is [out, in]; flax kernels are [in, out] -> transpose.
* packed attention ``in_proj_weight`` [3E, E] -> ``in_proj_kernel`` [E, 3E].
* ``LayerNorm.weight`` -> ``scale``.
* ``nn.Bilinear.weight`` [out, in1, in2] is kept as-is (our Bilinear uses the
  torch layout).

Known gap, faithful to the reference: ``GatedConcatFusion`` gates never appear
in reference state_dicts (unregistered plain-list bug, reference:
fusion.py:25-27), so transplanted gated_concat models keep this framework's
fresh gate init. A warning is emitted.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w).T.copy()


def _a(w) -> np.ndarray:
    return np.asarray(w).copy()


def _linear(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", flax_path + ("kernel",), _t),
        (f"{torch_prefix}.bias", flax_path + ("bias",), _a),
    ]


def _layernorm(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", flax_path + ("scale",), _a),
        (f"{torch_prefix}.bias", flax_path + ("bias",), _a),
    ]


def _mha(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.in_proj_weight", flax_path + ("in_proj_kernel",), _t),
        (f"{torch_prefix}.in_proj_bias", flax_path + ("in_proj_bias",), _a),
        *_linear(f"{torch_prefix}.out_proj", flax_path + ("out_proj",)),
    ]


def _transformer(torch_prefix: str, flax_path: Tuple[str, ...], num_layers: int = 2):
    rules = []
    for layer in range(num_layers):
        tp = f"{torch_prefix}.layers.{layer}"
        fp = flax_path + (f"layer_{layer}",)
        rules += _mha(f"{tp}.self_attn", fp + ("self_attn",))
        rules += _linear(f"{tp}.linear1", fp + ("linear1",))
        rules += _linear(f"{tp}.linear2", fp + ("linear2",))
        rules += _layernorm(f"{tp}.norm1", fp + ("norm1",))
        rules += _layernorm(f"{tp}.norm2", fp + ("norm2",))
    return rules


def _mil_pool(torch_head: str, torch_rho: str, flax_pool: str):
    fp = (flax_pool,)
    return [
        *_linear(f"{torch_head}.attention_a.0", fp + ("attention_head", "attention_a")),
        *_linear(f"{torch_head}.attention_b.0", fp + ("attention_head", "attention_b")),
        *_linear(f"{torch_head}.attention_c", fp + ("attention_head", "attention_c")),
        *_linear(f"{torch_rho}.0", fp + ("rho",)),
    ]


def _cag(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        *_linear(f"{torch_prefix}.fc1.0", flax_path + ("fc1",)),
        *_linear(f"{torch_prefix}.fc2.0", flax_path + ("fc2",)),
        *_linear(f"{torch_prefix}.fc3.0", flax_path + ("fc3",)),
        *_layernorm(f"{torch_prefix}.G.1", flax_path + ("ln_g",)),
        *_layernorm(f"{torch_prefix}.E.1", flax_path + ("ln_e",)),
        *_linear(f"{torch_prefix}.fc_c.0", flax_path + ("fc_c",)),
    ]


def _fusion(fusion: str):
    fp = ("fusion_layer",)
    if fusion == "concat":
        return [
            *_linear("fusion_layer.fusion_layer.0", fp + ("fc1",)),
            *_linear("fusion_layer.fusion_layer.2", fp + ("fc2",)),
        ]
    if fusion == "gated_concat":
        # gates are unregistered in the reference (fusion.py:25-27) and absent
        # from its state_dicts — only the MLP transplants.
        return [
            *_linear("fusion_layer.fusion_layer.0", fp + ("fc1",)),
            *_linear("fusion_layer.fusion_layer.2", fp + ("fc2",)),
        ]
    if fusion == "bilinear":
        return [
            *_linear("fusion_layer.linear_h1.0", fp + ("linear_h1",)),
            ("fusion_layer.linear_z1.weight", fp + ("linear_z1", "weight"), _a),
            ("fusion_layer.linear_z1.bias", fp + ("linear_z1", "bias"), _a),
            *_linear("fusion_layer.linear_o1.0", fp + ("linear_o1",)),
            *_linear("fusion_layer.linear_h2.0", fp + ("linear_h2",)),
            ("fusion_layer.linear_z2.weight", fp + ("linear_z2", "weight"), _a),
            ("fusion_layer.linear_z2.bias", fp + ("linear_z2", "bias"), _a),
            *_linear("fusion_layer.linear_o2.0", fp + ("linear_o2",)),
            *_linear("fusion_layer.fc1.0", fp + ("fc1",)),
            *_linear("fusion_layer.fc2.0", fp + ("fc2",)),
        ]
    raise ValueError(f"unknown fusion {fusion!r}")


def transplant_rules(model: str, n_signatures: int = 6, fusion: str = "concat",
                     fused_omics: bool = True):
    """Build the (torch_key, flax_path, transform[, slot]) rule list.

    ``slot`` (optional 4th element) is an integer: the value is written into
    ``leaf[slot, :v.shape[0], ...]`` of a stacked parameter (the fused
    OmicEncoderStack layout, ops/blocks.py)."""
    model = model.lower()
    rules: List = []
    rules += _linear("H.0", ("H", "fc"))
    if model in ("mcat", "nacagat"):
        for i in range(n_signatures):
            if fused_omics:
                rules += [
                    (f"G.{i}.0.0.weight", ("G", "fc1_kernel"), _t, i),
                    (f"G.{i}.0.0.bias", ("G", "fc1_bias"), _a, i),
                    (f"G.{i}.1.0.weight", ("G", "fc2_kernel"), _t, i),
                    (f"G.{i}.1.0.bias", ("G", "fc2_bias"), _a, i),
                ]
            else:
                rules += _linear(f"G.{i}.0.0", ("G", f"snn_{i}", "fc1"))
                rules += _linear(f"G.{i}.1.0", ("G", f"snn_{i}", "fc2"))
        if model == "mcat":
            rules += _mha("co_attention", ("co_attention",))
        else:
            rules += _mha("co_attention", ("co_attention", "mha"))
            rules += _cag("co_attention.CAG", ("co_attention", "cag"))
        # path/omic branches live as ONE vmapped module with a leading branch
        # axis (models/mcat.py _branch_pair): slot 0 = path, slot 1 = omic
        for slot, prefix in ((0, "path_transformer"), (1, "omic_transformer")):
            for tk, path, tr in _transformer(prefix, ("branch_transformer",)):
                rules.append((tk, path, tr, slot))
        for slot, (head, rho) in (
            (0, ("path_attention_head", "path_rho")),
            (1, ("omic_attention_head", "omic_rho")),
        ):
            for tk, path, tr in _mil_pool(head, rho, "branch_pool"):
                rules.append((tk, path, tr, slot))
        rules += _fusion(fusion)
    elif model in ("ge_nacagat", "genacagat"):
        rules += _mha("self_attention", ("self_attention",))
        rules += _transformer("path_transformer", ("path_transformer",))
        rules += _mil_pool("path_attention_head", "path_rho", "path_pool")
    else:
        raise ValueError(f"unknown model {model!r}")
    rules += _linear("classifier", ("classifier",))
    return rules


def from_torch_state_dict(
    model: str,
    state_dict: Dict[str, Any],
    init_params: Dict[str, Any],
    n_signatures: int = 6,
    fusion: str = "concat",
) -> Dict[str, Any]:
    """Convert a reference state_dict into this framework's param tree.

    ``init_params`` is a freshly-initialized ``{'params': ...}`` tree from
    ``model.init`` — leaves found in the state_dict are replaced (with shape
    checks); leaves not present in reference checkpoints (e.g. gated_concat
    gates) are kept from the init.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, init_params)
    root = params["params"] if "params" in params else params

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # strip DataParallel's "module." prefix if present (mcat/main.py:267-268)
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}

    # detect whether the target tree uses the fused omic layout
    fused_omics = "G" in root and isinstance(root["G"], dict) and "fc1_kernel" in root["G"]

    matched = set()
    for rule in transplant_rules(model, n_signatures, fusion, fused_omics):
        torch_key, flax_path, transform = rule[:3]
        slot = rule[3] if len(rule) > 3 else None
        if torch_key not in sd:
            warnings.warn(f"transplant: {torch_key} missing from state_dict")
            continue
        node = root
        for part in flax_path[:-1]:
            node = node[part]
        leaf = flax_path[-1]
        value = transform(sd[torch_key])
        if slot is not None:
            target = np.array(node[leaf])
            if value.ndim == 1:
                target[slot, : value.shape[0]] = value
            else:
                target[slot, : value.shape[0], : value.shape[1]] = value
            node[leaf] = target.astype(target.dtype)
        else:
            if node[leaf].shape != value.shape:
                raise ValueError(
                    f"shape mismatch for {torch_key} -> {'/'.join(flax_path)}: "
                    f"{node[leaf].shape} vs {value.shape}"
                )
            node[leaf] = value.astype(node[leaf].dtype)
        matched.add(torch_key)

    unmatched = set(sd) - matched
    if unmatched:
        warnings.warn(f"transplant: unused torch keys: {sorted(unmatched)[:8]}...")
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, params)


def load_torch_checkpoint(path: str):
    """Load a reference ``.pt`` checkpoint file (host-side, torch CPU).

    Returns the raw payload dict: {'epoch', 'model_state_dict',
    'optimizer_state_dict', 'loss'} (reference: mcat/main.py:95-100).
    """
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
