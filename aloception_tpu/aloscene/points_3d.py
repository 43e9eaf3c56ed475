"""Points3D: (N, 3) camera-coordinate points (reference: aloscene/points_3d.py:22)."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .augmented import AugmentedArray
from .labels import Labels


class Points3D(AugmentedArray):

    def __init__(self, x, labels: Union[dict, Labels, None] = None,
                 names=("N", None), **kwargs):
        super().__init__(x, names=names, **kwargs)
        self.add_child("labels", labels, align_dim=["N"], mergeable=True)

    def append_labels(self, labels: Labels, name: Optional[str] = None):
        self._append_child("labels", labels, name)

    def as_depth(self, camera_intrinsic, frame_size) -> "np.ndarray":
        """Project points back into a planar depth map (points_3d.py:73):
        each point lands at its projected pixel, value = Z."""
        H, W = frame_size
        K = np.asarray(camera_intrinsic.as_numpy()).reshape(-1, camera_intrinsic.shape[-2], 4)[0]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        pts = np.asarray(self.as_numpy()).reshape(-1, 3)
        z = pts[:, 2]
        valid = z > 1e-9
        u = np.clip(np.round(pts[valid, 0] / z[valid] * fx + cx).astype(int), 0, W - 1)
        v = np.clip(np.round(pts[valid, 1] / z[valid] * fy + cy).astype(int), 0, H - 1)
        depth = np.zeros((1, H, W), dtype=np.float32)
        depth[0, v, u] = z[valid]
        from .depth import Depth
        out = Depth(depth, is_absolute=True, is_planar=True)
        out.append_cam_intrinsic(camera_intrinsic.clone())
        return out

    # 3D points are invariant under 2D image geometry (the projection
    # changes via the intrinsic, which transforms separately)
    def _hflip(self, **kw): return self.clone()
    def _vflip(self, **kw): return self.clone()
    def _resize(self, size01, **kw): return self.clone()
    def _crop(self, H_crop, W_crop, **kw): return self.clone()
    def _pad(self, oy, ox, **kw): return self.clone()
    def _rotate(self, angle, center=None, **kw): return self.clone()
    def _spatial_shift(self, sy, sx, **kw): return self.clone()
