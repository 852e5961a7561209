"""Native (C++) host-side image pipeline: build-on-first-use + ctypes ABI.

``load_library()`` compiles image_pipeline.cpp with g++ (cached as a .so
next to the source, keyed on a hash of the source so a stale binary can
never shadow an edit — git does not preserve mtimes) and binds the C ABI.
Falls back gracefully (``available() -> False``) when no toolchain or
libjpeg/libpng are present — every caller keeps a PIL path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_pipeline.cpp")

_lib = None
_build_error: Optional[str] = None


def _so_path() -> Optional[str]:
    """Cache path keyed on the source hash (never stale after a clone).
    Computed lazily so importing this package never raises when the .cpp
    is absent (e.g. a packaged install) — available() just reports False
    (ADVICE r2)."""
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"image_pipeline-{digest}.so")


def _build(so: str) -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC,
        "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    except Exception as e:  # no g++ etc.
        return str(e)
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    # drop stale hashed binaries from earlier source revisions
    for name in os.listdir(_DIR):
        path = os.path.join(_DIR, name)
        if (name.startswith("image_pipeline-") and name.endswith(".so")
                and path != so):
            try:
                os.remove(path)
            except OSError:
                pass
    return None


def load_library():
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    so = _so_path()
    if so is None:
        _build_error = f"native source not found: {_SRC}"
        return None
    if not os.path.exists(so):
        _build_error = _build(so)
        if _build_error is not None:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        # A concurrent process running a DIFFERENT source revision may have
        # unlinked our cached .so between the exists check and CDLL (its
        # _build removes "stale" hashed binaries). Rebuild once instead of
        # permanently caching a build error for this process.
        _build_error = _build(so)
        if _build_error is not None:
            return None
        lib = ctypes.CDLL(so)
    lib.pv_decode_transform.restype = ctypes.c_int
    lib.pv_decode_transform.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.pv_load_batch.restype = ctypes.c_int
    lib.pv_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.pv_decode.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.pv_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.pv_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def build_error() -> Optional[str]:
    load_library()
    return _build_error


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_transform(data: bytes, resize: int, size: int,
                     mean, std) -> Optional[np.ndarray]:
    """One in-memory JPEG/PNG -> normalized float32 (size, size, 3)."""
    lib = load_library()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    ok = lib.pv_decode_transform(
        data, len(data), resize, size, _fptr(mean), _fptr(std), _fptr(out)
    )
    return out if ok else None


def decode(data: bytes) -> Optional[np.ndarray]:
    """Raw decode to uint8 HWC RGB at FULL resolution (the train-path
    random crops need the original geometry — DCT-domain scaling applies
    only to the eval transform path, pv_decode_transform/pv_load_batch)."""
    lib = load_library()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    ptr = lib.pv_decode(data, len(data), ctypes.byref(h), ctypes.byref(w))
    if not ptr:
        return None
    arr = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    lib.pv_free(ptr)
    return arr


def load_batch(paths, resize: int, size: int, mean, std,
               num_threads: int = 8):
    """Decode+transform a batch of image files in native threads.

    Returns (batch (n, size, size, 3) float32, ok flags (n,) bool).
    """
    lib = load_library()
    if lib is None:
        return None, None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.zeros((n,), np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.pv_load_batch(
        c_paths, n, resize, size, _fptr(mean), _fptr(std), _fptr(out),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads,
    )
    return out, ok.astype(bool)
