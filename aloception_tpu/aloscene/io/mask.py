"""Mask PNG reading (reference: aloscene/io/mask.py:7)."""

from __future__ import annotations

import numpy as np

from .errors import InvalidSampleError


def load_mask(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise InvalidSampleError(f"cannot read mask: {path}")
    return (img.astype(np.float32) / 255.0)[None]
