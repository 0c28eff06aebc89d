"""ctypes bindings to the native C++ IO backend (native/kornia_io.cpp) —
the analogue of the reference's Rust `kornia_rs` dependency
(kornia/io/io.py:24). Auto-builds the shared library on first use (one
translation unit, ~1s); falls back to PIL when a toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["native_available", "read_image_native", "write_image_native",
           "read_batch_native", "NativeBatchLoader"]

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(_repo_root(), "native")
    so_path = os.path.join(native_dir, "libkornia_io.so")
    if not os.path.exists(so_path):
        try:
            subprocess.run(["make", "-C", native_dir], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.kio_image_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.kio_image_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    lib.kio_jpeg_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.kio_png_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.kio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def read_image_native(path: str) -> np.ndarray:
    """→ (H, W, 3) uint8 RGB."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io backend unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.kio_image_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(c))
    if rc != 0:
        raise IOError(f"cannot read image info: {path} (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.kio_image_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise IOError(f"cannot decode image: {path} (rc={rc})")
    return out


def write_image_native(path: str, image: np.ndarray, quality: int = 95) -> None:
    """image: (H, W, C) uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io backend unavailable")
    img = np.ascontiguousarray(image)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    if path.lower().endswith(".png"):
        rc = lib.kio_png_write(path.encode(),
                               img.ctypes.data_as(ctypes.c_void_p), w, h, c)
    else:
        rc = lib.kio_jpeg_write(path.encode(),
                                img.ctypes.data_as(ctypes.c_void_p), w, h,
                                quality)
    if rc != 0:
        raise IOError(f"cannot write image: {path} (rc={rc})")


def read_batch_native(paths: List[str], size: Tuple[int, int],
                      num_threads: int = 0) -> np.ndarray:
    """Threaded decode+resize of a whole batch → (N, H, W, 3) uint8.

    One call decodes on all cores and yields a fixed-shape tensor ready
    for a single host→device transfer — the data-loader hot path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io backend unavailable")
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    status = (ctypes.c_int * n)()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.kio_read_batch(arr, n, w, h, out.ctypes.data_as(ctypes.c_void_p),
                       status, num_threads)
    bad = [paths[i] for i in range(n) if status[i] != 0]
    if bad:
        raise IOError(f"failed to decode: {bad[:3]}{'...' if len(bad) > 3 else ''}")
    return out


class NativeBatchLoader:
    """Double-buffered prefetching loader: decode batch k+1 on host threads
    while batch k runs on the TPU."""

    def __init__(self, paths: List[List[str]], size: Tuple[int, int],
                 num_threads: int = 0):
        self.batches = paths
        self.size = size
        self.num_threads = num_threads

    def __iter__(self):
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(read_batch_native, self.batches[0], self.size,
                              self.num_threads) if self.batches else None
            for i in range(len(self.batches)):
                cur = fut.result()
                if i + 1 < len(self.batches):
                    fut = pool.submit(read_batch_native, self.batches[i + 1],
                                      self.size, self.num_threads)
                yield cur
