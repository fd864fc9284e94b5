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
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
             _SRC, "-o", so_path],
            check=True,
            capture_output=True,
        )
        return so_path
    except Exception:
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
        lib = ctypes.CDLL(so)
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

    def _stem(self, slide_id: str) -> str:
        return slide_id[:-4] if slide_id.endswith(".svs") else slide_id

    def lookup(self, slide_id: str) -> int:
        return int(self._lib.bl_lookup(self._handle, self._stem(slide_id).encode()))

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
