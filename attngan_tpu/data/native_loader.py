"""ctypes bindings for the native C++ JPEG loader
(attngan_tpu/native/jpeg_loader.cpp, shipped as package data).

Builds the shared library on first use (g++ -O3, libjpeg) and caches it
next to the source — or, when the install location is read-only (a
pip-installed site-packages), under ~/.cache/attngan-tpu/. Falls back to
the PIL path transparently when the toolchain or libjpeg is unavailable,
or per-file when a decode fails (non-JPEG inputs, grayscale/CMYK exotica).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_PKG_ROOT, "native", "jpeg_loader.cpp")


def _build_dir() -> str:
    """In-tree build dir when writable, else a per-user cache dir."""
    in_tree = os.path.join(_PKG_ROOT, "native", "build")
    probe = os.path.dirname(in_tree)
    if os.access(probe, os.W_OK):
        return in_tree
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "attngan-tpu", "native_build")


_BUILD_DIR = _build_dir()
_LIB = os.path.join(_BUILD_DIR, "libjpeg_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC,
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC) or not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _lib_failed = True
            return None
        lib.ag_decode_one.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.ag_decode_one.restype = ctypes.c_int
        lib.ag_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.ag_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def decode_batch(
    paths: List[str], res: int = 256, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize files in parallel.

    Returns (images (N, res, res, 3) uint8, ok (N,) bool). Files the native
    decoder rejects are retried through PIL; still-failing entries have
    ok=False and zeroed pixels.
    """
    lib = get_lib()
    n = len(paths)
    out = np.zeros((n, res, res, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    if lib is not None and n:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        lib.ag_decode_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), res,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_threads)
    # PIL fallback for rejected/failed files (or everything without the lib)
    from attngan_tpu.data.dataset import decode_image

    for i in range(n):
        if not ok[i]:
            try:
                out[i] = decode_image(paths[i], res)
                ok[i] = 1
            except (OSError, FileNotFoundError):
                pass
    return out, ok.astype(bool)
