"""ctypes wrapper for the native packed-dataset loader.

``NativePackedDataset`` is drop-in compatible with
data/packed_dataset.PackedDataset (same iterator contract) but decodes and
shuffles blocks in a C++ prefetch thread (native/packed_loader.cpp),
keeping the host Python thread free to feed the TPU. Falls back to the
numpy reader when the shared library hasn't been built."""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = Path(__file__).parent / "libfastmax_native.so"
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.pl_open.restype = ctypes.c_void_p
    lib.pl_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
        ctypes.c_long, ctypes.c_ulong, ctypes.c_int, ctypes.c_int,
    ]
    lib.pl_next.restype = ctypes.c_long
    lib.pl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.pl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativePackedDataset:
    """Iterable over (block_size,) int64 arrays, C++-prefetched."""

    def __init__(self, filenames: Sequence, block_size: int, *, seed: int = 12345,
                 shuffle: bool = True, wrap: bool = False, n_prefetch: int = 16,
                 num_processes: int = 1, process_rank: int = 0):
        self._filenames = [str(f) for f in filenames][process_rank::num_processes]
        self._block_size = block_size
        self._seed = seed
        self._shuffle = shuffle
        self._wrap = wrap
        self._n_prefetch = n_prefetch

    def __iter__(self) -> Iterator[np.ndarray]:
        lib = _load_lib()
        if lib is None:
            from ..data.packed_dataset import PackedDataset

            yield from PackedDataset(
                self._filenames, n_chunks=min(8, max(len(self._filenames), 1)),
                block_size=self._block_size, seed=self._seed,
                shuffle=self._shuffle, wrap=self._wrap,
            )
            return
        files = (ctypes.c_char_p * len(self._filenames))(
            *[f.encode() for f in self._filenames]
        )
        handle = lib.pl_open(files, len(self._filenames), self._block_size,
                             self._n_prefetch, self._seed,
                             int(self._shuffle), int(self._wrap))
        if not handle:
            raise RuntimeError("pl_open failed")
        buf = np.empty(self._block_size, np.int32)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        try:
            while True:
                n = lib.pl_next(handle, ptr)
                if n == 0:
                    return
                yield buf[:n].astype(np.int64)
        finally:
            lib.pl_close(handle)
