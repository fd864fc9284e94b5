"""ctypes bindings for the native C++ bag loader (native/bagloader.cc).

Builds the shared library on first use (g++ -O3, cached next to the source)
and exposes:

* ``NativeBagStore`` — BagStore-protocol store over a directory of `.npy`
  bags, with O(1) length probes from the file headers (no payload reads);
* ``load_batch`` — threaded fill of a whole padded batch
  (wsi [B, bucket, D] f32 + mask [B, bucket] bool) in one native call.

Falls back gracefully: ``available()`` returns False when the toolchain or
platform is missing, and callers keep the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "bagloader.cc",
)


def _build_lib() -> Optional[str]:
    so_path = os.path.join(os.path.dirname(_SRC), "libbagloader.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    # compile to a private temp name, then atomically publish: concurrent
    # processes (multi-process launch, parallel test runners) must never CDLL
    # a partially-written .so
    tmp_path = f"{so_path}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             _SRC, "-o", tmp_path],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_path, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        so = _build_lib()
        if so is None:
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            # e.g. a stale .so for another arch copied in with a fresh mtime:
            # the documented contract is graceful fallback, not a crash
            _LIB = False
            return None
        lib.bl_open.restype = ctypes.c_void_p
        lib.bl_open.argtypes = [ctypes.c_char_p]
        lib.bl_count.restype = ctypes.c_int64
        lib.bl_count.argtypes = [ctypes.c_void_p]
        lib.bl_lookup.restype = ctypes.c_int64
        lib.bl_lookup.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.bl_length.restype = ctypes.c_int64
        lib.bl_length.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bl_dim.restype = ctypes.c_int64
        lib.bl_dim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bl_load_batch.restype = ctypes.c_int
        lib.bl_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.bl_close.restype = None
        lib.bl_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def available() -> bool:
    return _load() is not None


_STORES: dict = {}
_STORES_LOCK = threading.Lock()


def shared_store(patches_dir: str) -> "NativeBagStore":
    """One NativeBagStore per directory: bl_open readdirs + header-parses
    every slide, so train/val/test/predict batchers over the same store
    should share a single index instead of rebuilding it each."""
    key = os.path.abspath(patches_dir)
    with _STORES_LOCK:
        store = _STORES.get(key)
        if store is None:
            store = NativeBagStore(patches_dir)
            _STORES[key] = store
        return store


class NativeBagStore:
    """Directory of `.npy` bags indexed and batch-loaded by the C++ runtime."""

    def __init__(self, patches_dir: str, threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native bag loader unavailable (g++ build failed)")
        self._lib = lib
        self.threads = threads
        self._handle = lib.bl_open(patches_dir.encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot open bag directory {patches_dir!r}")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.bl_close(self._handle)
        except Exception:
            pass

    def lookup(self, slide_id: str) -> int:
        from multimodal_path_omic_tpu.data.bags import slide_basename

        return int(
            self._lib.bl_lookup(self._handle, slide_basename(slide_id).encode())
        )

    def exists(self, slide_id: str) -> bool:
        return self.lookup(slide_id) >= 0

    def length(self, slide_id: str) -> int:
        return int(self._lib.bl_length(self._handle, self.lookup(slide_id)))

    def dim(self, slide_id: str) -> int:
        return int(self._lib.bl_dim(self._handle, self.lookup(slide_id)))

    def get(self, slide_id: str) -> np.ndarray:
        """Single-bag fetch (BagStore protocol); batch path is load_batch."""
        m = self.length(slide_id)
        d = self.dim(slide_id)
        wsi, _ = self.load_batch([slide_id], bucket=m, dim=d)
        return wsi[0]

    def load_batch(
        self, slide_ids: Sequence[str], bucket: int, dim: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(slide_ids)
        ids = np.array([self.lookup(s) for s in slide_ids], dtype=np.int64)
        if (ids < 0).any():
            missing = [s for s, i in zip(slide_ids, ids) if i < 0]
            raise FileNotFoundError(f"bags missing: {missing[:4]}")
        wsi = np.empty((n, bucket, dim), dtype=np.float32)
        mask = np.empty((n, bucket), dtype=np.uint8)
        err = self._lib.bl_load_batch(
            self._handle,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n,
            bucket,
            dim,
            wsi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.threads,
        )
        if err != 0:
            raise IOError(f"native bag load failed (code {err})")
        return wsi, mask.astype(bool)


class NativePipeline:
    """C++ pipelined epoch executor: worker threads fill a ring of slot
    buffers according to a precomputed batch plan; Python consumes ready
    batches in order and releases slots after the device transfer.

    plan: list of (slide_ids: list[str], bucket: int) batches.
    """

    def __init__(
        self,
        store: "NativeBagStore",
        plan,
        batch_size: int,
        dim: int,
        n_slots: int = 3,
        threads: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._store = store
        self.plan = plan
        self.batch_size = batch_size
        self.dim = dim
        self.max_bucket = max(b for _, b in plan) if plan else 0
        self.n_slots = n_slots

        # NOTE: hasattr() on a CDLL resolves (and caches) the symbol without
        # setting argtypes/restype — always bind explicitly (idempotent),
        # otherwise the returned pointer is truncated to a C int.
        self._bind_pipe(lib)

        flat, offsets, buckets = [], [0], []
        for ids, bucket in plan:
            for s in ids:
                i = store.lookup(s)
                if i < 0:
                    # surface the missing/unparseable slide by name now —
                    # a -1 id handed to C++ would come back as a bare IOError
                    raise FileNotFoundError(f"bag missing from native index: {s!r}")
                flat.append(i)
            offsets.append(len(flat))
            buckets.append(bucket)
        self._flat = np.array(flat, dtype=np.int64)
        self._offsets = np.array(offsets, dtype=np.int64)
        self._buckets = np.array(buckets, dtype=np.int64)
        self.wsi_slots = np.empty(
            (n_slots, batch_size, self.max_bucket, dim), dtype=np.float32
        )
        self.mask_slots = np.empty(
            (n_slots, batch_size, self.max_bucket), dtype=np.uint8
        )
        self._pipe = lib.bl_pipe_create(
            store._handle,
            self._flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(plan),
            batch_size,
            dim,
            self.max_bucket,
            self.wsi_slots.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.mask_slots.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_slots,
            threads,
        )

    @staticmethod
    def _bind_pipe(lib):
        lib.bl_pipe_create.restype = ctypes.c_void_p
        lib.bl_pipe_create.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.bl_pipe_next.restype = ctypes.c_int64
        lib.bl_pipe_next.argtypes = [ctypes.c_void_p]
        lib.bl_pipe_release.restype = None
        lib.bl_pipe_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bl_pipe_error.restype = ctypes.c_int
        lib.bl_pipe_error.argtypes = [ctypes.c_void_p]
        lib.bl_pipe_destroy.restype = None
        lib.bl_pipe_destroy.argtypes = [ctypes.c_void_p]

    def batches(self):
        """Yield (batch_index, wsi_view [B, bucket, D], mask_view [B, bucket]).

        The views alias the slot buffer — consume (e.g. device_put) before the
        next iteration, which releases the slot.
        """
        pending = None
        try:
            while True:
                b = int(self._lib.bl_pipe_next(self._pipe))
                if pending is not None:
                    self._lib.bl_pipe_release(self._pipe, pending)
                if b < 0:
                    break
                err = int(self._lib.bl_pipe_error(self._pipe))
                if err:
                    raise IOError(f"native pipeline fill failed (code {err})")
                slot = b % self.n_slots
                bucket = int(self._buckets[b])
                yield (
                    b,
                    self.wsi_slots[slot, :, :bucket, :],
                    self.mask_slots[slot, :, :bucket].astype(bool),
                )
                pending = b
        finally:
            self.close()

    def close(self):
        if getattr(self, "_pipe", None):
            self._lib.bl_pipe_destroy(self._pipe)
            self._pipe = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
