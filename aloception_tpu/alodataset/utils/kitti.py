"""KITTI calibration parsing (reference: alodataset/utils/kitti.py:19)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def load_calib_cam_to_cam(path: str) -> Dict[str, np.ndarray]:
    """Parse a KITTI calib_cam_to_cam file into named float arrays."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            try:
                out[key.strip()] = np.array(
                    [float(v) for v in vals.split()], np.float32)
            except ValueError:
                continue
    return out


def intrinsic_from_calib(calib: Dict[str, np.ndarray], cam: int = 2
                         ) -> np.ndarray:
    """P_rect_0X (3x4) -> [..., 3, 4] intrinsic-style matrix."""
    P = calib.get(f"P_rect_0{cam}", calib.get(f"P{cam}"))
    if P is None:
        raise KeyError(f"no projection matrix for cam {cam}")
    return P.reshape(3, 4).astype(np.float32)


def baseline_from_calib(calib: Dict[str, np.ndarray]) -> Optional[float]:
    """Stereo baseline from P_rect_02/03: b = -(P3[0,3]-P2[0,3]) / fx."""
    try:
        P2 = calib["P_rect_02"].reshape(3, 4)
        P3 = calib["P_rect_03"].reshape(3, 4)
        return float((P2[0, 3] - P3[0, 3]) / P2[0, 0])
    except KeyError:
        return None
