"""Device mesh + sharding layout — the framework's scale-out layer.

The reference's only parallelism is single-process ``nn.DataParallel``
(reference: mcat/main.py:267-268; SURVEY.md §2.8). The TPU-native design uses
a ``jax.sharding.Mesh`` with two axes:

* ``data`` — bags (batch dim). Each step's gradient all-reduce rides ICI;
  this is the reference's DP, done the XLA way.
* ``seq``  — the patch axis M inside each bag. Sequence parallelism the
  reference lacks by design (SURVEY.md §2.8 "TPU-native mapping"): WSI
  encoding, co-attention K/V and masked softmax partition over M; GSPMD
  inserts the collectives (psum of softmax statistics / attention partials).

Everything goes through ``jax.jit`` with sharded inputs — no hand-written
collectives in the model code; XLA chooses all-gather/psum placements from the
input layouts, which is exactly the recipe that scales on ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1, seq: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, seq) mesh. ``data*seq`` must not exceed device count."""
    if devices is None:
        devices = jax.devices()
    n = data * seq
    if n > len(devices):
        raise ValueError(f"mesh {data}x{seq} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, seq)
    return Mesh(grid, axis_names=("data", "seq"))


def batch_spec(key: str, stacked: bool = False) -> P:
    """PartitionSpec for a batch-dict field. ``stacked``: the field carries a
    leading [K] dispatch-group axis (multi-step dispatch) that stays
    unsharded — the K steps run sequentially (lax.scan); each step's batch
    keeps the same (data, seq) layout as a single-step call."""
    if key in ("wsi", "mask", "wsi_scale"):
        spec = ("data", "seq")  # [B, M, ...]: bags over data, patches over seq
    else:
        spec = ("data",)  # per-sample vectors/scalars (incl. omics_packed)
    return P(None, *spec) if stacked else P(*spec)


def cache_spec(key: str) -> P:
    """PartitionSpec for a device-dataset-cache field (data/device_cache.py).

    The bag axis (rows gathered per step) must stay UNSHARDED so ``jnp.take``
    over it is communication-free; memory scaling comes from sharding the
    patch axis over every mesh device instead. The gathered batch is then
    sharding-constrained to the canonical (data, seq) batch layout inside the
    jitted step (train/loop.py::_gather_batch) — one all-to-all per step over
    batch-sized (not cohort-sized) bytes, riding ICI.
    """
    if key in ("wsi", "mask", "wsi_scale"):
        return P(None, ("data", "seq"))  # [n_bags, bucket(, D)]
    return P()  # label/omics/censorship tables: tiny, replicated


def put_global(value: np.ndarray, sh: NamedSharding):
    """device_put that also works across processes.

    Multi-host device_put cannot target non-addressable devices; here every
    process holds the FULL host value (e.g. the device-dataset cache, whose
    cohort every host can read) and contributes just its addressable shards
    (``jax.make_array_from_callback``). Single-process: plain device_put.
    All processes must pass identical values — jax assembles the global array
    trusting the per-process shard contributions agree.
    """
    value = np.asarray(value)
    if jax.process_count() == 1:
        return jax.device_put(value, sh)
    return jax.make_array_from_callback(value.shape, sh, lambda idx: value[idx])


def _put(value: np.ndarray, sh: NamedSharding, process_local: bool):
    if process_local:
        # multi-host: `value` is THIS process's slice of the global batch
        # (the BucketBatcher's host_slice contract); jax assembles the global
        # array from per-process shards without any cross-host transfer
        return jax.make_array_from_process_local_data(sh, np.asarray(value))
    return jax.device_put(np.asarray(value), sh)


def shard_batch(
    batch: Dict[str, Any],
    mesh: Mesh,
    process_local: Optional[bool] = None,
    stacked: bool = False,
) -> Dict[str, Any]:
    """device_put every field with its mesh layout (omics lists handled).

    ``process_local``: multi-host mode — each field holds only this process's
    slice of the global batch and the global array is assembled from the
    per-process shards (``jax.make_array_from_process_local_data``). Defaults
    to on when ``jax.process_count() > 1``.

    ``stacked``: fields carry a leading [K] dispatch-group axis (multi-step
    dispatch, train/loop.py::stack_batches); it stays unsharded.
    """
    if process_local is None:
        process_local = jax.process_count() > 1
    out = {}
    for key, value in batch.items():
        if key in ("bucket", "n_real", "index"):
            out[key] = value
            continue
        if key == "omics":
            sh = NamedSharding(mesh, batch_spec("label", stacked))
            out[key] = [_put(o, sh, process_local) for o in value]
        else:
            sh = NamedSharding(mesh, batch_spec(key, stacked))
            out[key] = _put(value, sh, process_local)
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host: device_put cannot target non-addressable devices, so the
    global replicated array is assembled from each process's (identical)
    local copy — PRNG key arrays go through key_data/wrap_key_data.
    """
    sh = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)

    def _rep(x):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sh, np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(_rep, tree)
