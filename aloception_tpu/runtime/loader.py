"""ctypes binding for the native data-loader core (aloloader.cpp).

Builds libaloloader.so on first use (g++ + libjpeg/libpng, all baked into
the image) and caches it next to the source. Falls back cleanly when the
toolchain is unavailable — callers check ``native_loader_available()``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "aloloader.cpp")
_SO = os.path.join(_HERE, "libaloloader.so")
_SO_SHA = _SO + ".sha"
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERR: Optional[str] = None

RESNET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
RESNET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _cache_valid() -> bool:
    """The .so is never committed (built on this machine from source); a
    sha256 sidecar of the source validates it — mtimes are unreliable after
    a fresh clone, and a stale/foreign-arch binary must never be loaded."""
    if not (os.path.exists(_SO) and os.path.exists(_SO_SHA)):
        return False
    try:
        with open(_SO_SHA) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-ljpeg", "-lpng", "-lpthread", "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=120)
        with open(_SO_SHA, "w") as f:
            f.write(_src_hash())
        return None
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError, OSError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _LIB, _BUILD_ERR
    with _LOCK:
        if _LIB is not None or _BUILD_ERR is not None:
            return _LIB
        if not _cache_valid():
            err = _build()
            if err is not None:
                _BUILD_ERR = err
                return None
        lib = ctypes.CDLL(_SO)
        lib.alo_decode_resize.restype = ctypes.c_int
        lib.alo_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.alo_load_batch.restype = ctypes.c_int
        lib.alo_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
        return _LIB


def native_loader_available() -> bool:
    return _load() is not None


class NativeImageLoader:
    """Threaded decode+resize+normalize of image batches in native code.

    mode: "raw" (0..255), "01", or "resnet" ((x/255 - mean) / std).
    """

    MODES = {"raw": 0, "01": 1, "resnet": 2}

    def __init__(self, size: Tuple[int, int], mode: str = "resnet",
                 mean=RESNET_MEAN, std=RESNET_STD, n_threads: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_BUILD_ERR}")
        self.lib = lib
        self.size = tuple(size)
        self.mode = self.MODES[mode]
        self.mean = np.ascontiguousarray(mean, np.float32)
        self.std = np.ascontiguousarray(std, np.float32)
        self.n_threads = n_threads

    def load_batch(self, paths: Sequence[str]
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """paths -> ((N, H, W, 3) float32 NHWC, (N,) bool ok-mask)."""
        n = len(paths)
        h, w = self.size
        out = np.zeros((n, h, w, 3), np.float32)
        ok = np.zeros(n, np.int32)
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        self.lib.alo_load_batch(
            c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
            self.mode,
            self.mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return out, ok.astype(bool)

    def load(self, path: str) -> np.ndarray:
        out, ok = self.load_batch([path])
        if not ok[0]:
            from ..aloscene import InvalidSampleError
            raise InvalidSampleError(f"native decode failed: {path}")
        return out[0]
