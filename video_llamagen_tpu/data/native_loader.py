"""ctypes bindings for the native C++ prefetching dataloader.

Wraps native/libvlg_dataloader.so: a worker-thread pool that reads .npy
sample files, converts to float32, and assembles batches in a bounded ring
buffer — IO and parsing run off the GIL (the reference's DataLoader
num_workers analog). Falls back to a pure-Python iterator when the shared
library is missing.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libvlg_dataloader.so"),
    "libvlg_dataloader.so",
]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
            break
        except OSError:
            continue
    else:
        return None
    lib.vlg_loader_create.restype = ctypes.c_void_p
    lib.vlg_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64]
    lib.vlg_loader_create_ex.restype = ctypes.c_void_p
    lib.vlg_loader_create_ex.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.vlg_loader_next.restype = ctypes.c_int64
    lib.vlg_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.vlg_loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.vlg_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


_LIB = None


def get_lib():
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


NORMALIZE_PM1 = 1   # u1 pixels -> [-1, 1] (training-ready)
RANDOM_HFLIP = 2    # per-sample hflip of (H, W, C) samples, seed-deterministic


class NativeNpyLoader:
    """Iterate float32 batches over a list of .npy files (one sample each).

    `flags` moves per-sample transform work onto the C++ worker threads
    (NORMALIZE_PM1 | RANDOM_HFLIP). Scope boundary: inputs are precomputed
    .npy tensors/latents — raw JPEG/video decode is intentionally out of
    scope (the reference pipelines we mirror consume precomputed T5 features
    and VQ codes/latents the same way; see SURVEY.md §2.7)."""

    def __init__(self, paths: List[str], batch_size: int, capacity: int = 4,
                 n_threads: int = 2, flags: int = 0, seed: int = 0):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.capacity = capacity
        self.n_threads = n_threads
        self.flags = flags
        self.seed = seed
        self._lib = get_lib()

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._lib is None:
            yield from self._python_fallback()
            return
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        handle = self._lib.vlg_loader_create_ex(
            arr, len(self.paths), self.batch_size, self.capacity,
            self.n_threads, self.flags, self.seed)
        try:
            while True:
                data_ptr = ctypes.POINTER(ctypes.c_float)()
                shape = (ctypes.c_int64 * 16)()
                ndim = ctypes.c_int64()
                batch_id = ctypes.c_int64()
                n = self._lib.vlg_loader_next(
                    handle, ctypes.byref(data_ptr), shape,
                    ctypes.byref(ndim), ctypes.byref(batch_id))
                if n == 0:
                    return
                dims = tuple(shape[i] for i in range(ndim.value))
                total = int(np.prod(dims))
                out = np.ctypeslib.as_array(data_ptr, shape=(total,)) \
                    .reshape(dims).copy()
                self._lib.vlg_loader_release(handle, batch_id)
                yield out
        finally:
            self._lib.vlg_loader_destroy(handle)

    def _python_fallback(self) -> Iterator[np.ndarray]:
        import numpy.random as npr
        for i in range(0, len(self.paths) - self.batch_size + 1,
                       self.batch_size):
            items = []
            for j, p in enumerate(self.paths[i:i + self.batch_size]):
                a = np.load(p)
                if a.dtype == np.uint8:
                    x = (a.astype(np.float32) / 127.5 - 1.0
                         if self.flags & NORMALIZE_PM1
                         else a.astype(np.float32) / 255.0)
                else:
                    x = a.astype(np.float32)
                if (self.flags & RANDOM_HFLIP) and x.ndim == 3 and \
                        npr.RandomState(self.seed + i + j).rand() < 0.5:
                    x = x[:, ::-1]
                items.append(x)
            yield np.stack(items)
