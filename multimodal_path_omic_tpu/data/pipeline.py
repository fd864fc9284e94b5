"""Bucketed batching + host prefetch: ragged bags -> static-shape device feed.

The reference trains batch-size-1 with 32-step gradient accumulation
(reference: mcat/main.py:69-74, config.yaml:67-68) because bags are ragged.
The TPU-native equivalent: group samples into length buckets, pad each bag to
its bucket, and emit whole batches of ``batch_size`` same-bucket bags — one
jitted train step per bucket, each step being one optimizer update over the
same effective batch the reference accumulates.

Partial batches are padded with repeated samples carrying ``weight 0`` so
shapes stay static; losses use the weights (ops/losses.py ``sample_weight``)
and metrics drop them.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from multimodal_path_omic_tpu.data.bags import DEFAULT_BUCKETS, bucket_for, pad_bag


class Batch(dict):
    """A dict batch with attribute access for the common fields:
    wsi [B, Mb, D], mask [B, Mb], omics list of [B, s_i], label [B],
    censorship [B], survival_months [B], weight [B], index [B]."""

    __getattr__ = dict.__getitem__


def pad_plan_indices(indices: Sequence[int], batch_size: int):
    """Static-shape batch fill: repeat the last index into the padding rows
    and weight them 0 (losses/metrics drop them). Returns (full, weight)."""
    real = len(indices)
    full = list(indices) + [indices[-1]] * (batch_size - real)
    weight = np.zeros((batch_size,), np.float32)
    weight[:real] = 1.0
    return full, weight


class BucketBatcher:
    """Builds bucketed, padded batches from a dataset.

    ``dataset`` needs: ``__len__``, ``bag(i) -> [M, D]``, and a
    ``batch_extras(indices) -> dict of np arrays`` provided via the
    ``extras_fn`` argument (labels/omics differ per task).
    """

    def __init__(
        self,
        dataset,
        extras_fn,
        batch_size: int,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        host_slice=None,
    ):
        self.dataset = dataset
        self.extras_fn = extras_fn
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        # Multi-host data feeding: (process_index, process_count). The epoch
        # plan is seed-deterministic, so every host computes the SAME global
        # plan and materializes only its contiguous slice of each batch
        # (batch_size must divide by process_count); the global device array
        # is assembled by jax.make_array_from_process_local_data
        # (parallel/mesh.py shard_batch process_local mode).
        self.host_slice = host_slice
        self._epoch = 0
        # Bag lengths probed once (cheap for npy/h5 backends; .pt requires a
        # load — cached).
        self._lengths = None
        # Native C++ batch loader (mmap + thread pool) when the store is a
        # directory of .npy bags and the toolchain is available.
        self._native = None
        try:
            from multimodal_path_omic_tpu.data.bags import NpyBagStore
            from multimodal_path_omic_tpu.data import native as native_mod

            store = getattr(dataset, "store", None)
            if (
                isinstance(store, NpyBagStore)
                and hasattr(dataset, "slide_id")
                and native_mod.available()
            ):
                self._native = native_mod.shared_store(store.patches_dir)
        except Exception:
            self._native = None

    def _bag_lengths(self) -> np.ndarray:
        if self._lengths is None:
            if self._native is not None:
                lengths = np.array(
                    [
                        self._native.length(self.dataset.slide_id(i))
                        for i in range(len(self.dataset))
                    ]
                )
                if (lengths < 0).any():
                    # some bag the C++ header parser rejects (float64/f16,
                    # 1-D, fortran order) but np.load handles: the native
                    # index can't serve this cohort — keep the Python path
                    # for EVERYTHING rather than mixing -1 lengths into
                    # bucket assignment / batch loading
                    self._native = None
                    self._lengths = self._lengths_with_sidecar()
                else:
                    self._lengths = lengths
            else:
                self._lengths = self._lengths_with_sidecar()
        return self._lengths

    def _lengths_with_sidecar(self) -> np.ndarray:
        """Bag lengths via a JSON sidecar cache next to the store when
        possible. Probing a .pt store otherwise deserializes every bag just to
        read its shape (reference-format stores can be large).

        Entries are ``[length, mtime_ns, size]`` validated against the bag
        file's current stat — re-extracted embeddings (same slide id, new
        patch count) invalidate their entry instead of training on stale
        lengths (which would crash in pad_bag or silently truncate in the
        device cache). Legacy bare-int entries are treated as misses."""
        import json
        import os

        store = getattr(self.dataset, "store", None)
        sidecar = None
        cache = {}
        patches_dir = getattr(store, "patches_dir", None)
        path_fn = getattr(store, "_path", None)
        if patches_dir and os.path.isdir(patches_dir):
            sidecar = os.path.join(patches_dir, ".bag_lengths.json")
            if os.path.exists(sidecar):
                try:
                    with open(sidecar) as f:
                        cache = json.load(f)
                except Exception:
                    cache = {}

        def _stat(key):
            if path_fn is None:
                return None
            try:
                st = os.stat(path_fn(key))
                return [st.st_mtime_ns, st.st_size]
            except OSError:
                return None

        lengths = []
        dirty = False
        for i in range(len(self.dataset)):
            key = None
            if sidecar is not None and hasattr(self.dataset, "slide_id"):
                key = str(self.dataset.slide_id(i))
            sig = _stat(key) if key is not None else None
            if key is not None and key in cache:
                entry = cache[key]
                if (
                    isinstance(entry, list)
                    and len(entry) == 3
                    and sig is not None
                    and entry[1:] == sig
                ):
                    lengths.append(int(entry[0]))
                    continue
            m = int(self.dataset.bag(i).shape[0])
            lengths.append(m)
            if key is not None and sig is not None:
                cache[key] = [m, *sig]
                dirty = True
        if sidecar is not None and dirty:
            try:
                with open(sidecar, "w") as f:
                    json.dump(cache, f)
            except OSError:
                pass  # read-only store: just skip the cache
        return np.array(lengths)

    def __len__(self) -> int:
        """Exact number of batches an epoch yields (bucket histogram based)."""
        n = len(self.dataset)
        if n == 0:
            return 0
        lengths = self._bag_lengths()
        counts: Dict[int, int] = {}
        for length in lengths:
            b = bucket_for(int(length), self.buckets)
            counts[b] = counts.get(b, 0) + 1
        if self.drop_remainder:
            return sum(c // self.batch_size for c in counts.values())
        return sum(-(-c // self.batch_size) for c in counts.values())

    def _epoch_plan(self) -> List:
        """The epoch's batches as (indices, bucket) in emission order."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        lengths = self._bag_lengths()
        plan: List = []
        pending: Dict[int, List[int]] = {}
        for i in order:
            b = bucket_for(int(lengths[i]), self.buckets)
            pending.setdefault(b, []).append(int(i))
            if len(pending[b]) == self.batch_size:
                plan.append((pending.pop(b), b))
        for b, idxs in sorted(pending.items()):
            if idxs and not self.drop_remainder:
                plan.append((idxs, b))
        return plan

    # slot-ring budget for the C++ pipelined executor (bytes of wsi buffers)
    PIPELINE_BUDGET_BYTES = 2 << 30
    # The pipelined executor's yielded wsi arrays alias reusable slot buffers.
    # Batches from it carry ``aliased=True`` so consumers can close the hazard
    # (copy on CPU, or complete the H2D transfer before advancing — the
    # Trainer's _device_batch does exactly this, which is why the Trainer
    # auto-engages the pipeline). Leave False for consumers that hold raw
    # numpy views across iterations.
    use_native_pipeline: bool = False

    def batches(self) -> Iterator[Batch]:
        """Yield bucketed padded batches.

        ALIASING CONTRACT when ``use_native_pipeline`` is set: a yielded
        batch's ``wsi`` array aliases a reusable slot buffer (the batch
        carries ``aliased=True``) — copy it, or complete a guaranteed-copy
        device transfer, BEFORE advancing the iterator.
        """
        plan = self._epoch_plan()
        if self.use_native_pipeline and self._native is not None and plan:
            max_bucket = max(b for _, b in plan)
            dim = self._native.dim(self.dataset.slide_id(int(plan[0][0][0])))
            n_slots = 3
            if (
                n_slots * self.batch_size * max_bucket * dim * 4
                <= self.PIPELINE_BUDGET_BYTES
            ):
                yield from self._pipelined(plan, dim, n_slots)
                return
        for indices, bucket in plan:
            yield self._make_batch(indices, bucket)

    @property
    def host_slice(self):
        return self._host_slice

    @host_slice.setter
    def host_slice(self, value):
        # Validates on EVERY assignment, not just the constructor: the
        # Trainer sets this after construction (trainer.py), and a
        # non-divisible batch_size would otherwise silently drop the
        # remainder rows of every batch (_local_slice floor-divides).
        if value is not None and self.batch_size % value[1] != 0:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by process "
                f"count {value[1]}"
            )
        self._host_slice = value

    def _local_slice(self):
        """(start, stop) rows of each global batch this host materializes."""
        if self.host_slice is None:
            return 0, self.batch_size
        pid, count = self.host_slice
        per = self.batch_size // count
        return pid * per, (pid + 1) * per

    def _pipelined(self, plan, dim: int, n_slots: int) -> Iterator[Batch]:
        """C++ pipelined epoch executor: worker threads fill a slot ring ahead
        of consumption (data/native.py::NativePipeline)."""
        from multimodal_path_omic_tpu.data.native import NativePipeline

        lo, hi = self._local_slice()
        fills = [pad_plan_indices(indices, self.batch_size) for indices, _ in plan]
        id_plan = [
            ([self.dataset.slide_id(i) for i in full[lo:hi]], bucket)
            for (full, _), (_, bucket) in zip(fills, plan)
        ]
        pipe = NativePipeline(
            self._native, id_plan, hi - lo, dim, n_slots=n_slots
        )
        for (bi, wsi, mask), (indices, bucket), (full, weight) in zip(
            pipe.batches(), plan, fills
        ):
            real = len(indices)
            local = np.array(full[lo:hi])
            batch = Batch(
                wsi=wsi,
                mask=mask,
                weight=weight[lo:hi],
                index=local.astype(np.int32),
                bucket=bucket,
                n_real=real,
                aliased=True,  # wsi aliases a recyclable slot buffer
            )
            batch.update(self.extras_fn(self.dataset, local))
            yield batch

    def _make_batch(self, indices: List[int], bucket: int) -> Batch:
        real = len(indices)
        full, weight = pad_plan_indices(indices, self.batch_size)
        lo, hi = self._local_slice()
        local = full[lo:hi]
        if self._native is not None:
            slide_ids = [self.dataset.slide_id(i) for i in local]
            dim = self._native.dim(slide_ids[0])
            wsi, masks = self._native.load_batch(slide_ids, bucket, dim)
        else:
            masks = np.zeros((len(local), bucket), dtype=bool)
            bags = []
            for i in local:
                bag = np.asarray(self.dataset.bag(i), dtype=np.float32)
                padded, mask = pad_bag(bag, bucket)
                bags.append(padded)
                masks[len(bags) - 1] = mask
            wsi = np.stack(bags)
        batch = Batch(
            wsi=wsi,
            mask=masks,
            weight=weight[lo:hi],
            index=np.array(local, np.int32),
            bucket=bucket,
            n_real=real,
        )
        batch.update(self.extras_fn(self.dataset, np.array(local)))
        return batch


def survival_extras(dataset, indices: np.ndarray) -> Dict[str, np.ndarray]:
    """Labels + signature omics for the survival models."""
    t = dataset.table
    return {
        "survival_months": t.survival_months[indices],
        "label": t.survival_class[indices],
        "censorship": t.censorship[indices],
        "omics": [t.signature_data[n][indices] for n in t.signature_names],
    }


def gene_expr_extras(dataset, indices: np.ndarray) -> Dict[str, np.ndarray]:
    return {"label": dataset.table.gene_expr_class[indices]}


def prefetch(iterator: Iterator, depth: int = 2) -> Iterator:
    """Background-thread prefetch of host batches (overlaps bag IO + padding
    with device compute — the reference leans on DataLoader workers for this,
    mcat/main.py:250-252)."""
    if depth <= 0:
        yield from iterator
        return
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    error: List[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that notices an abandoned consumer: a plain q.put would
        # block forever once the consumer generator is dropped (e.g. a train
        # step raised mid-epoch), pinning the source iterator — and with it
        # the native pipeline's slot buffers/threads — for the process's life
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    break
        except BaseException as exc:  # propagate to consumer
            error.append(exc)
        finally:
            # run the source generator's finalizers (NativePipeline.close)
            # from the thread that owns the running frame
            close = getattr(iterator, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        # consumer done or abandoned: release the worker (it may be blocked
        # on a full queue), then drain so its pending put unblocks
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
