"""ctypes bindings + build for the native batch-gather (_native/gather.cpp).

``gather_batch(data, indices)`` assembles a minibatch from the uint8 memmap
cache with a threaded C++ memcpy; transparently falls back to numpy fancy
indexing when the shared library hasn't been built or fails to load.

Build once per machine:  python -m vgd_tpu.data.native
(auto-attempted on first import; g++ is in the base image).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_native", "gather.cpp")
_LIB = os.path.join(_DIR, "_native", "libvgdgather.so")

_lib = None
_lock = threading.Lock()
_build_attempted = False


def build(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    global _build_attempted
    _build_attempted = True
    if os.path.exists(_LIB) and not force:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_attempted
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) and not _build_attempted:
            build()
        if os.path.exists(_LIB):
            try:
                lib = ctypes.CDLL(_LIB)
                lib.gather_rows.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
                lib.gather_rows_signed_f32.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
                _lib = lib
            except OSError:
                _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def gather_batch(data: np.ndarray, indices: np.ndarray,
                 out: np.ndarray = None, n_threads: int = None) -> np.ndarray:
    """out[i] = data[indices[i]] for a uint8 (N, ...) array."""
    assert data.dtype == np.uint8
    b = len(indices)
    row_shape = data.shape[1:]
    row_bytes = int(np.prod(row_shape))
    if out is None:
        out = np.empty((b,) + row_shape, np.uint8)
    lib = _load()
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    if lib is None or n_threads <= 1:
        # single-core hosts: numpy's take is already a memcpy loop and the
        # ctypes/thread-spawn overhead would dominate
        np.take(data, indices, axis=0, out=out)
        return out
    idx = np.ascontiguousarray(indices, np.int64)
    lib.gather_rows(
        data.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(b), ctypes.c_int64(row_bytes),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(n_threads))
    return out


def gather_batch_signed_f32(data: np.ndarray, indices: np.ndarray,
                            n_threads: int = None) -> np.ndarray:
    """Fused gather + uint8 -> [-1,1] float32 (host-side consumers)."""
    assert data.dtype == np.uint8
    b = len(indices)
    row_shape = data.shape[1:]
    row_elems = int(np.prod(row_shape))
    out = np.empty((b,) + row_shape, np.float32)
    lib = _load()
    if lib is None:
        out[:] = data[indices].astype(np.float32) / 127.5 - 1.0
        return out
    idx = np.ascontiguousarray(indices, np.int64)
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    lib.gather_rows_signed_f32(
        data.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(b), ctypes.c_int64(row_elems),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(n_threads))
    return out


if __name__ == "__main__":
    ok = build(force=True)
    print("built" if ok else "BUILD FAILED", _LIB)
