"""Pallas row-gather kernel: device-cache batch assembly at DMA speed.

The device-resident dataset cache (data/device_cache.py) assembles every
training batch on device by gathering bag rows: ``wsi = take(pool, pos)``
with pool [n_bags, bucket, D] and pos [B]. Measured on the v5e dev chip,
XLA lowers this row gather to ~36 GB/s effective — ~10x below the chip's
contiguous-read bandwidth (343 GB/s measured on the same shapes) — costing
~0.9 ms of a 1.4 ms cached train step at the headline B=32/bucket=512
shape. The rows being gathered are 1 MB contiguous each; nothing about the
access pattern justifies that.

This kernel turns the gather into what it physically is: B x (M/block)
block DMAs whose source address comes from a scalar-prefetched index
vector (``pltpu.PrefetchScalarGridSpec``) — the pipeline knows each block's
source row before the body runs, so the copy streams at HBM speed. The
body is a pure VMEM copy; no compute.

No VJP is defined on purpose: the pool is the dataset cache (a constant
w.r.t. differentiation), so the gather never sits on the params->loss
gradient path.

Dispatch policy (see loop.py::_gather_batch): TPU backend, single-device
(pallas_call has no GSPMD partitioning rule — mesh runs keep jnp.take,
whose cost there is hidden behind the batch all-to-all), 3-D pool, bucket
divisible by the block. Everything else falls back to jnp.take.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512 rows x 1024 feat x 4B = 2 MiB per in/out buffer, x2 double-buffering
# = 8 MiB VMEM worst-case (f32): comfortably inside v5e VMEM alongside the
# scalar operand. Powers-of-two buckets (data/bags.py) are all divisible.
_BLOCK_M = 512


def _copy_kernel(idx_ref, pool_ref, out_ref):
    del idx_ref  # consumed by the index maps, not the body
    out_ref[...] = pool_ref[...]


def supported(pool, idx) -> bool:
    """Kernel eligibility for this (pool, idx) pair on the current backend."""
    if jax.devices()[0].platform != "tpu":
        return False
    if pool.ndim != 3 or idx.ndim != 1:
        return False
    n, m, d = pool.shape
    block = min(_BLOCK_M, m)
    if m % block != 0:
        return False
    if d % 128 != 0:  # lane-aligned feature dim (wsi D=1024)
        return False
    if pool.dtype not in (jnp.float32, jnp.bfloat16, jnp.int8):
        return False
    return True


def gather_rows(pool, idx, *, interpret: bool = False):
    """``pool[idx]`` for pool [N, M, D], idx [B] int32 -> [B, M, D].

    Semantically identical to ``jnp.take(pool, idx, axis=0)`` for in-range
    indices (the cache path guarantees 0 <= idx < N: build_meta pads with a
    repeated real row, never an out-of-range one).
    """
    n, m, d = pool.shape
    b = idx.shape[0]
    block = min(_BLOCK_M, m)
    grid = (b, m // block)

    return pl.pallas_call(
        _copy_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block, d), lambda bi, mi, idx_ref: (idx_ref[bi], mi, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block, d), lambda bi, mi, idx_ref: (bi, mi, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, d), pool.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), pool)


def take_rows(pool, idx):
    """Row gather with automatic kernel dispatch: the Pallas copy kernel when
    eligible (TPU, 3-D, aligned), else ``jnp.take``. Single-device only —
    mesh callers go through :func:`take_rows_sharded`."""
    if supported(pool, idx):
        return gather_rows(pool, idx)
    return jnp.take(pool, idx, axis=0)


def sharded_supported(pool, idx, mesh) -> bool:
    """Eligibility of the shard_map'd kernel for a cache-layout pool on
    ``mesh``: the per-device patch slice must itself pass :func:`supported`
    (TPU backend, block-divisible, lane-aligned)."""
    if pool.ndim != 3 or idx.ndim != 1:
        return False
    n_mesh = mesh.devices.size
    n, m, d = pool.shape
    if m % n_mesh != 0:
        return False
    local = jax.ShapeDtypeStruct((n, m // n_mesh, d), pool.dtype)
    return supported(local, idx)


def take_rows_sharded(pool, idx, mesh, *, interpret: bool = False):
    """``pool[idx]`` for a PATCH-axis-sharded device-cache pool on ``mesh``.

    The cache layout (parallel/mesh.py::cache_spec) keeps the bag axis
    unsharded and splits the patch axis over every mesh device, so the row
    gather is communication-free per shard. GSPMD has no partitioning rule
    for ``pallas_call`` (it would all-gather the pool and run the kernel
    replicated), so this wraps the copy kernel in ``shard_map``: each device
    streams block DMAs out of its local [n_bags, bucket/n_mesh, D] shard
    with the (replicated) index vector — identical semantics to
    ``jnp.take(pool, idx, axis=0)``, same output sharding, no collectives.

    ``interpret`` forces the kernel's interpret mode (CPU-mesh testing).
    Callers gate on :func:`sharded_supported` (except under ``interpret``).
    """
    from jax.sharding import PartitionSpec as P

    spec = P(None, mesh.axis_names)
    return jax.shard_map(
        lambda p, i: gather_rows(p, i, interpret=interpret),
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
        check_vma=False,
    )(pool, idx.astype(jnp.int32))
