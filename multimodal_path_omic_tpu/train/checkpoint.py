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
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

# A single long-lived checkpointer so saves can be ASYNC: orbax's
# StandardCheckpointer commits in a background thread; training continues
# while the previous checkpoint writes (multi-host: every process must call
# save/wait collectively). wait_for_checkpoints() joins all pending commits.
_CHECKPOINTER = None
_CKPT_LOCK = threading.Lock()


def _get_checkpointer():
    global _CHECKPOINTER
    with _CKPT_LOCK:
        if _CHECKPOINTER is None:
            import orbax.checkpoint as ocp

            _CHECKPOINTER = ocp.StandardCheckpointer()
        return _CHECKPOINTER


def wait_for_checkpoints() -> None:
    """Block until every async checkpoint save has committed to disk."""
    with _CKPT_LOCK:
        ckptr = _CHECKPOINTER
    if ckptr is not None:
        ckptr.wait_until_finished()


def save_checkpoint(
    directory: str,
    payload: Dict[str, Any],
    *,
    model_name: str,
    dataset_name: str,
    epoch: int,
    block: bool = True,
    tag: Optional[str] = None,
) -> str:
    """Write a checkpoint; returns its path.

    Uses orbax when available, falling back to a single .npy of the payload
    (pickled object array — logged loudly, since it is neither portable nor
    safe to load from untrusted sources). ``block=False`` returns as soon as
    the device arrays are snapshotted and lets orbax commit in the
    background (async checkpointing); call ``wait_for_checkpoints()`` before
    reading the file or exiting.

    ``tag`` names a STABLE path ``<model>_<dataset>_<tag>`` that is
    overwritten on every save (used for the rolling best-model checkpoint);
    without it the reference's timestamped ``_E<n>_<ts>`` scheme applies
    (mcat/main.py:91) and an existing destination stays an error.
    """
    os.makedirs(directory, exist_ok=True)
    if tag is not None:
        name = f"{model_name}_{dataset_name}_{tag}"
    else:
        now = datetime.datetime.now().strftime("%Y%m%d%H%M")
        name = f"{model_name}_{dataset_name}_E{epoch + 1}_{now}"
    path = os.path.join(directory, name)
    try:
        ckptr = _get_checkpointer()
    except ImportError as exc:
        # only a MISSING orbax degrades to the pickle fallback; write
        # failures (destination exists, disk full) must stay loud — silently
        # pickling on those masked the real error and could half-write
        print(
            f"WARNING: orbax checkpointing unavailable ({type(exc).__name__}); "
            f"writing PICKLED numpy fallback {path}.npy — not portable, do not "
            "load from untrusted sources"
        )
        np.save(path + ".npy", np.array([payload], dtype=object), allow_pickle=True)
        return path + ".npy"
    # force only on tagged (rolling) paths: overwriting a timestamped
    # checkpoint would mask a real collision. AsyncCheckpointer.save joins
    # any in-flight commit before starting, so force+async cannot race a
    # pending write to the same path.
    ckptr.save(os.path.abspath(path), payload, force=tag is not None)
    if block:
        ckptr.wait_until_finished()
    return path


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
