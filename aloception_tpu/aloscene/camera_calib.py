"""Camera calibration types (reference: aloscene/camera_calib.py:11,170).

CameraIntrinsic: [..., 3, 4] pinhole projection matrix whose principal point /
focals adjust under flip/resize/crop/pad (camera_calib.py:99-165).
CameraExtrinsic: [..., 4, 4] world->camera transform, geometry-invariant.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from .augmented import AugmentedArray


class CameraIntrinsic(AugmentedArray):

    def __init__(self, x=None, focal_length=None, plane_size=None,
                 principal_point=None, skew=None, names=(None, None), **kwargs):
        if x is None:
            x = np.zeros((4, 4), dtype=np.float32)
            fl = focal_length if isinstance(focal_length, tuple) else (focal_length, focal_length)
            x[0][0] = fl[1] if fl[1] is not None else np.inf
            x[1][1] = fl[0] if fl[0] is not None else np.inf
            x[0][1] = skew if skew is not None else 0
            if principal_point is None and plane_size is not None:
                principal_point = (plane_size[0] / 2, plane_size[1] / 2)
            elif principal_point is None:
                principal_point = (0, 0)
            x[0][2] = principal_point[1]
            x[1][2] = principal_point[0]
            x[2][2] = 1
            x[3][3] = 1
            names = (None, None)
        else:
            x = np.asarray(x, dtype=np.float32) if not hasattr(x, "dtype") else x
            assert x.shape[-1] == 4 and x.shape[-2] in (3, 4)
            if names is None or len(names) != x.ndim:
                names = (None,) * x.ndim
        super().__init__(x, names=names, **kwargs)

    @property
    def focal_length(self):
        return self.array[..., (0, 1), (0, 1)]

    @property
    def principal_points(self):
        return self.array[..., (0, 1), (2, 2)]

    @property
    def skew(self):
        return self.array[..., 0, 1]

    def _updated(self, fn) -> "CameraIntrinsic":
        arr = np.array(self.as_numpy())
        fn(arr)
        n = self.clone()
        n.array = arr
        return n

    def _hflip(self, *args, frame_size: Tuple[int, int], **kwargs):
        assert np.all(np.abs(np.asarray(self.skew)) < 1e-3)
        return self._updated(lambda a: a.__setitem__(
            (..., 0, 2), frame_size[1] - a[..., 0, 2]))

    def _vflip(self, *args, frame_size: Tuple[int, int], **kwargs):
        assert np.all(np.abs(np.asarray(self.skew)) < 1e-3)
        return self._updated(lambda a: a.__setitem__(
            (..., 1, 2), frame_size[0] - a[..., 1, 2]))

    def _resize(self, size01, **kwargs):
        def fn(a):
            a[..., 0, 0] *= size01[1]
            a[..., 1, 1] *= size01[0]
            a[..., 0, 2] *= size01[1]
            a[..., 1, 2] *= size01[0]
        return self._updated(fn)

    def _crop(self, H_crop, W_crop, frame_size, **kwargs):
        def fn(a):
            a[..., 0, 2] -= W_crop[0] * frame_size[1]
            a[..., 1, 2] -= H_crop[0] * frame_size[0]
        return self._updated(fn)

    def _pad(self, offset_y, offset_x, frame_size, **kwargs):
        def fn(a):
            a[..., 0, 2] += offset_x[0] * frame_size[1]
            a[..., 1, 2] += offset_y[0] * frame_size[0]
        return self._updated(fn)

    def _rotate(self, angle, center=None, **kwargs):
        raise NotImplementedError

    def _spatial_shift(self, sy, sx, **kwargs):
        raise NotImplementedError


class CameraExtrinsic(AugmentedArray):
    """[..., 4, 4] camera pose; invariant under 2D image geometry
    (camera_calib.py:170-239)."""

    def __init__(self, x, names=None, **kwargs):
        x = np.asarray(x, dtype=np.float32) if not hasattr(x, "dtype") else x
        assert x.shape[-2] == 4 and x.shape[-1] == 4
        if names is None or len(names) != x.ndim:
            names = (None,) * x.ndim
        super().__init__(x, names=names, **kwargs)

    def translation_with(self, tgt_pos: "CameraExtrinsic"):
        """Translation of tgt pose expressed in this pose's frame
        (camera_calib.py:187)."""
        t = np.linalg.solve(np.asarray(self.as_numpy()), np.asarray(tgt_pos.as_numpy()))
        return t[..., :3, -1]

    def distance_with(self, tgt_pos: "CameraExtrinsic"):
        return np.linalg.norm(self.translation_with(tgt_pos), axis=-1)

    def _hflip(self, *a, **kw): return self.clone()
    def _vflip(self, *a, **kw): return self.clone()
    def _resize(self, *a, **kw): return self.clone()
    def _crop(self, *a, **kw): return self.clone()
    def _pad(self, *a, **kw): return self.clone()
    def _rotate(self, *a, **kw): return self.clone()
    def _spatial_shift(self, *a, **kw): return self.clone()


class Pose(CameraExtrinsic):
    """A pose is an extrinsic-style 4x4 transform (reference: aloscene/pose.py:5)."""
