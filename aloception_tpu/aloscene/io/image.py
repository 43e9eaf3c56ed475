"""Image reading (reference: aloscene/io/image.py:10).

Returns CHW float32 arrays; raises InvalidSampleError on unreadable files so
datasets can skip/retry.
"""

from __future__ import annotations

import numpy as np

from .errors import InvalidSampleError


def load_image(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise InvalidSampleError(f"cannot read image: {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.ascontiguousarray(img.transpose(2, 0, 1)).astype(np.float32)
