"""Depth file reading: npy/npz (reference: aloscene/io/depth.py:4)."""

from __future__ import annotations

import numpy as np

from .errors import InvalidSampleError


def load_depth(path: str, key: str = "arr_0") -> np.ndarray:
    if path.endswith(".npy"):
        arr = np.load(path)
    elif path.endswith(".npz"):
        arr = np.load(path)[key]
    else:
        raise InvalidSampleError(f"unsupported depth format: {path}")
    arr = arr.astype(np.float32)
    return arr[None] if arr.ndim == 2 else arr
