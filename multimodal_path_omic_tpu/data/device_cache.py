"""Device-resident dataset cache: upload the cohort once, gather on device.

Survival WSI cohorts are small by accelerator standards (hundreds of patients
x up to ~2 MB of patch embeddings per bag), while the reference's training
loop re-reads every bag from disk every epoch (reference: dataset.py:124-126
via DataLoader workers). On a TPU the analogous waste is the host->device
transfer: re-uploading the whole cohort every epoch dominates end-to-end
time whenever the interconnect is slow relative to compute (measured: the
round-1 e2e run was transfer-bound at ~20 bags/sec on the tunneled dev
setup while device compute sustained >15k bags/sec for the same steps).

``DeviceBagCache`` stores, per bag-length bucket, one padded device array of
all that bucket's bags (+ masks), plus the whole label/omics table — then
every training batch is assembled ON DEVICE by ``jnp.take`` over cached rows
(train/loop.py::make_cached_train_step). Steady-state epochs transfer only
KBs of indices. Auto-engages when the cohort fits the configured budget
(tpu.device_cache_budget_bytes) on a single-mesh run.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_path_omic_tpu.data.bags import bucket_for


class DeviceBagCache:
    """Per-bucket padded device arrays of every bag + the label/omics table.

    ``caches[bucket]`` is a dict of device arrays consumed by the cached
    train step: wsi [n_b, bucket, D], mask [n_b, bucket], label [n],
    and (survival mode) omics_packed [n, S], censorship [n],
    survival_months [n]. ``position(bucket)[row]`` maps a dataset row to its
    bucket-local wsi index.
    """

    def __init__(
        self,
        dataset,
        extras_fn,
        buckets: Sequence[int],
        *,
        ge_mode: bool = False,
        lengths: Optional[np.ndarray] = None,
        upload_chunk: int = 64,
        store_dtype: str = "float32",
        mesh=None,
        only_buckets: Optional[Sequence[int]] = None,
    ):
        """``mesh``: shard the cache over the mesh (parallel/mesh.py
        ``cache_spec``): the patch axis spreads over EVERY mesh device (per-
        device memory = total / n_devices) while the bag axis stays whole so
        per-step gathers are communication-free. ``only_buckets``: cache only
        these buckets (partial caching — the Trainer host-feeds the rest)."""
        import jax
        import jax.numpy as jnp

        self.mesh = mesh
        # multi-host: every process reads the (shared) cohort and contributes
        # its addressable shards of the global cache arrays (put_global) —
        # one preallocated full-bucket host array in the store dtype, filled
        # chunk-by-chunk, then a single global put per bucket array.
        multi_process = jax.process_count() > 1
        if mesh is not None:
            from jax.sharding import NamedSharding

            from multimodal_path_omic_tpu.parallel.mesh import cache_spec, put_global

            def _put(x, key):
                return put_global(x, NamedSharding(mesh, cache_spec(key)))
        elif multi_process:  # pragma: no cover - Trainer raises first
            raise ValueError("multi-process DeviceBagCache requires a mesh")
        else:

            def _put(x, key):
                return jax.device_put(x)

        n = len(dataset)
        if lengths is None:
            lengths = np.array([dataset.bag(i).shape[0] for i in range(n)])
        self.bucket_of = np.array(
            [bucket_for(int(m), tuple(buckets)) for m in lengths]
        )
        self._position = np.zeros(n, np.int32)
        self.caches: Dict[int, Dict] = {}

        extras = extras_fn(dataset, np.arange(n))
        table = {"label": _put(np.asarray(extras["label"]), "label")}
        if not ge_mode:
            table["omics_packed"] = _put(
                np.concatenate([np.asarray(o) for o in extras["omics"]], axis=-1),
                "omics_packed",
            )
            table["censorship"] = _put(np.asarray(extras["censorship"]), "censorship")
            table["survival_months"] = _put(
                np.asarray(extras["survival_months"]), "survival_months"
            )

        if store_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"store_dtype must be float32, bfloat16 or int8, got {store_dtype!r}"
            )
        self.store_dtype = store_dtype
        int8 = store_dtype == "int8"
        bf16 = store_dtype == "bfloat16"
        if int8:
            from multimodal_path_omic_tpu.data.quant import quantize_bag_int8

        dim = int(dataset.bag(0).shape[1]) if n else 0
        all_buckets = sorted(set(self.bucket_of.tolist()))
        self.cached_buckets = (
            [b for b in all_buckets if b in set(only_buckets)]
            if only_buckets is not None
            else all_buckets
        )
        for bucket in self.cached_buckets:
            rows = np.flatnonzero(self.bucket_of == bucket)
            self._position[rows] = np.arange(len(rows), dtype=np.int32)
            # upload in chunks to bound host staging memory. Multi-process
            # puts cannot go chunk-by-chunk (eager concatenation of
            # non-addressable global arrays is not allowed), so there the
            # chunks fill ONE preallocated full-bucket array in the STORE
            # dtype — 1x peak host memory — and a single put_global follows.
            if multi_process:
                if int8:
                    w_all = np.empty((len(rows), bucket, dim), np.int8)
                    s_all = np.empty((len(rows), bucket), np.float32)
                else:
                    w_all = np.empty(
                        (len(rows), bucket, dim),
                        jnp.bfloat16 if bf16 else np.float32,
                    )
                m_all = np.zeros((len(rows), bucket), bool)
            parts_w, parts_m, parts_s = [], [], []
            for s in range(0, len(rows), upload_chunk):
                chunk_rows = rows[s : s + upload_chunk]
                wsi = np.zeros((len(chunk_rows), bucket, dim), np.float32)
                mask = np.zeros((len(chunk_rows), bucket), bool)
                for j, r in enumerate(chunk_rows):
                    bag = np.asarray(dataset.bag(int(r)), np.float32)
                    m = bag.shape[0]
                    if m > bucket:
                        # bucket_for guarantees m <= bucket when the lengths
                        # probe was correct; clamping here would silently
                        # train on amputated bags (e.g. a stale length cache)
                        raise ValueError(
                            f"bag {int(r)} has {m} patches but was assigned "
                            f"bucket {bucket} — stale bag-length probe? "
                            "(delete the store's .bag_lengths.json sidecar)"
                        )
                    wsi[j, :m] = bag[:m]
                    mask[j, :m] = True
                sl = slice(s, s + len(chunk_rows))
                if int8:
                    q, scale = quantize_bag_int8(wsi)
                    if multi_process:
                        w_all[sl], s_all[sl] = q, scale
                    else:
                        parts_w.append(_put(q, "wsi"))
                        parts_s.append(_put(scale, "wsi_scale"))
                elif bf16:
                    # under default matmul precision the MXU consumes bf16
                    # operands regardless — bf16 storage is the same math,
                    # half the HBM, and no giant on-device convert
                    if multi_process:
                        w_all[sl] = wsi.astype(jnp.bfloat16)
                    else:
                        parts_w.append(_put(wsi.astype(jnp.bfloat16), "wsi"))
                else:
                    if multi_process:
                        w_all[sl] = wsi
                    else:
                        parts_w.append(_put(wsi, "wsi"))
                if multi_process:
                    m_all[sl] = mask
                else:
                    parts_m.append(_put(mask, "mask"))
            if multi_process:
                cache = dict(
                    wsi=_put(w_all, "wsi"), mask=_put(m_all, "mask"), **table
                )
                if int8:
                    cache["wsi_scale"] = _put(s_all, "wsi_scale")
                self.caches[bucket] = cache
                continue

            def _cat(parts, key):
                if len(parts) == 1:
                    return parts[0]
                # re-pin the layout: concatenate preserves shardings in
                # practice, but the cache contract (shard-local gathers)
                # depends on it, so don't rely on propagation
                return _put(jnp.concatenate(parts), key)

            cache = dict(
                wsi=_cat(parts_w, "wsi"), mask=_cat(parts_m, "mask"), **table
            )
            if int8:
                cache["wsi_scale"] = _cat(parts_s, "wsi_scale")
            self.caches[bucket] = cache

    @staticmethod
    def nbytes(
        lengths: np.ndarray, buckets: Sequence[int], dim: int,
        store_dtype: str = "float32",
        only_buckets: Optional[Sequence[int]] = None,
    ) -> int:
        """TOTAL device bytes the wsi cache would need (padded to buckets;
        divide by the mesh device count for per-device bytes — the patch axis
        shards over every device). int8 stores 1 byte/element + a 4-byte f32
        scale per patch row. ``only_buckets`` restricts to a bucket subset
        (partial caching)."""
        bpe = {"int8": 1, "bfloat16": 2}.get(store_dtype, 4)
        per_patch = dim + 4 if store_dtype == "int8" else dim * bpe
        keep = None if only_buckets is None else set(only_buckets)
        total = 0
        for m in lengths:
            b = bucket_for(int(m), tuple(buckets))
            if keep is None or b in keep:
                total += b * per_patch
        return int(total)

    @staticmethod
    def bucket_bytes(
        lengths: np.ndarray, buckets: Sequence[int], dim: int,
        store_dtype: str = "float32",
    ) -> Dict[int, int]:
        """Per-bucket wsi cache bytes (for the partial-caching budget fit)."""
        bpe = {"int8": 1, "bfloat16": 2}.get(store_dtype, 4)
        per_patch = dim + 4 if store_dtype == "int8" else dim * bpe
        out: Dict[int, int] = {}
        for m in lengths:
            b = bucket_for(int(m), tuple(buckets))
            out[b] = out.get(b, 0) + b * per_patch
        return out

    def position(self, rows: np.ndarray) -> np.ndarray:
        return self._position[np.asarray(rows)]


def plan_cache_fit(
    per_bucket: Dict[int, int],
    counts: Dict[int, int],
    budget_total: int,
    *,
    forced: bool = False,
    multi_host: bool = False,
) -> Tuple[Optional[List[int]], int, bool]:
    """The ONE budget-fit policy shared by the Trainer
    (trainer._ensure_device_cache) and the AOT planner (train/plan.py):
    given per-bucket cache bytes and bag counts, decide what gets cached.

    Returns ``(only_buckets, resident_bytes, engaged)``:
    ``only_buckets`` None = every bucket (full cache), a list = partial cache
    (greedy cheapest-bytes-per-bag fit), and ``engaged`` False = host feeding
    (resident 0). Forced mode ("device_cache: on") always caches everything —
    the budget is advisory there, which is why the planner must use this
    helper instead of re-deriving the policy. Multi-host never partial-caches
    (the host-fed overflow share has no per-process slice contract).
    """
    total = sum(per_bucket.values())
    if forced or total <= budget_total:
        return None, total, True
    if multi_host:
        return None, 0, False
    order = sorted(per_bucket, key=lambda b: per_bucket[b] / counts[b])
    chosen: List[int] = []
    used = 0
    for b in order:
        if used + per_bucket[b] <= budget_total:
            chosen.append(b)
            used += per_bucket[b]
    if not chosen:
        return None, 0, False
    return chosen, used, True


def build_meta(
    indices: List[int], batch_size: int, cache: DeviceBagCache
) -> Tuple[Dict[str, np.ndarray], int]:
    """Per-batch gather meta (tiny host arrays) for the cached train step."""
    real = len(indices)
    full = np.array(
        list(indices) + [indices[-1]] * (batch_size - real), np.int32
    )
    weight = np.zeros((batch_size,), np.float32)
    weight[:real] = 1.0
    return {
        "pos": cache.position(full),
        "row": full,
        "weight": weight,
    }, real
