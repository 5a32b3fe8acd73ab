"""ctypes binding + lazy build of the native batch JPEG decoder."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastdecode.cpp")
_LIB_PATH = os.path.join(_HERE, "_fastdecode.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library. Returns an error string or None."""
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH, "-ljpeg", "-pthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"compiler unavailable: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-500:]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fd_decode_batch.restype = ctypes.c_int
            lib.fd_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.fd_decode_batch_mem.restype = ctypes.c_int
            lib.fd_decode_batch_mem.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.POINTER(ctypes.c_longlong),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
        except (OSError, AttributeError) as e:
            _build_error = f"dlopen failed: {e}"


def is_available() -> bool:
    _load()
    return _lib is not None


def decode_batch(paths: Sequence[str], out_size: int,
                 out: Optional[np.ndarray] = None,
                 n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs into a uint8 [N, S, S, 3] array.

    Returns (images, status) where status[i] != 0 marks a failed decode
    (the caller resamples those slots, matching the PIL path's policy).
    """
    _load()
    if _lib is None:
        raise RuntimeError(f"native decoder unavailable: {_build_error}")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_size, out_size, 3), np.uint8)
    assert out.shape == (n, out_size, out_size, 3) and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"]
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode("utf-8") for p in paths])
    _lib.fd_decode_batch(
        c_paths, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, status


def decode_batch_mem(blob: np.ndarray, offsets: np.ndarray,
                     lengths: np.ndarray, out_size: int,
                     out: Optional[np.ndarray] = None,
                     n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEG byte ranges of one in-memory blob (e.g. an mmap'd
    RecordIO .rec) into a uint8 [N, S, S, 3] array.

    `blob` is a 1-D uint8 array/memmap; `offsets[i]`/`lengths[i]` bound
    image i's encoded bytes. Returns (images, status) with the
    decode_batch failure contract.
    """
    _load()
    if _lib is None:
        raise RuntimeError(f"native decoder unavailable: {_build_error}")
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n = len(offsets)
    if len(lengths) != n:
        raise ValueError("offsets/lengths length mismatch")
    if blob.dtype != np.uint8 or blob.ndim != 1:
        raise ValueError("blob must be a 1-D uint8 array")
    if n and int((offsets + lengths).max()) > blob.size:
        raise ValueError("offset+length beyond blob end")
    if n and (int(offsets.min()) < 0 or int(lengths.min()) < 0):
        raise ValueError("negative offset/length")
    if out is None:
        out = np.empty((n, out_size, out_size, 3), np.uint8)
    assert out.shape == (n, out_size, out_size, 3) and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"]
    status = np.zeros((n,), np.int32)
    _lib.fd_decode_batch_mem(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, status
