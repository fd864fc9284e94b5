"""Checkpoint save/restore (orbax) — closes the reference's resume gaps.

The reference saves {'epoch', 'model_state_dict', 'optimizer_state_dict',
'loss'} every ``checkpoint_epoch`` epochs (reference: mcat/main.py:88-100) and
on resume re-runs the saved epoch with a fresh RNG and a *different* unseeded
split (mcat/main.py:309-312; SURVEY.md §3.5). Here the payload additionally
carries the RNG key, the split seed, and the next epoch index, so resume is
deterministic and does not repeat the checkpointed epoch.

File naming mirrors the reference scheme:
``<model>_<dataset>_E<n>_<timestamp>`` (mcat/main.py:91).
"""

from __future__ import annotations

import datetime
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(
    directory: str,
    payload: Dict[str, Any],
    *,
    model_name: str,
    dataset_name: str,
    epoch: int,
) -> str:
    """Write a checkpoint; returns its path.

    Uses orbax when available, falling back to a single .npz of the flattened
    pytree plus the structure pickled via numpy (keeps zero extra deps).
    """
    os.makedirs(directory, exist_ok=True)
    now = datetime.datetime.now().strftime("%Y%m%d%H%M")
    name = f"{model_name}_{dataset_name}_E{epoch + 1}_{now}"
    path = os.path.join(directory, name)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), payload)
        ckptr.wait_until_finished()
        return path
    except Exception:
        np.save(path + ".npy", np.array([payload], dtype=object), allow_pickle=True)
        return path + ".npy"


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore a checkpoint written by save_checkpoint."""
    if path.endswith(".npy"):
        return np.load(path, allow_pickle=True)[0]
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))
