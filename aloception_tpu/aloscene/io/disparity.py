"""Disparity file reading: ``.pfm`` / ``.png`` (reference: aloscene/io/disparity.py:7)."""

from __future__ import annotations

import re

import numpy as np

from .errors import InvalidSampleError


def load_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> (C, H, W) float32."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            channels = 3
        elif header == b"Pf":
            channels = 1
        else:
            raise InvalidSampleError(f"not a PFM file: {path}")
        dims = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if not dims:
            raise InvalidSampleError(f"malformed PFM header: {path}")
        w, h = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    data = data.reshape(h, w, channels)
    data = np.flipud(data)  # PFM stores bottom-to-top
    return np.ascontiguousarray(data.transpose(2, 0, 1)).astype(np.float32)


def load_disp(path: str, png_negate=None) -> np.ndarray:
    if path.endswith(".pfm"):
        return load_pfm(path)
    if path.endswith(".png"):
        import cv2
        img = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise InvalidSampleError(f"cannot read disparity png: {path}")
        disp = img.astype(np.float32) / 256.0  # KITTI convention
        if png_negate is None:
            raise ValueError(
                "png_negate must be set explicitly when loading .png disparity")
        if png_negate:
            disp = -disp
        return disp[None]
    raise InvalidSampleError(f"unsupported disparity format: {path}")
