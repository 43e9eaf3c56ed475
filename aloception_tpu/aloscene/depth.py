"""Depth maps with scale-state machinery (reference: aloscene/depth.py:18).

State: ``is_absolute`` (+ scale/shift of the inverse encoding) and
``is_planar`` (planar Z vs euclidean ray length). Conversions:
encode_inverse:63 / encode_absolute:106, as_points3d:211, as_disp:324,
as_planar:426 / as_euclidean:380.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from .spatial import SpatialAugmentedArray
from .mask import Mask


class Depth(SpatialAugmentedArray):

    def __init__(self, x, occlusion: Optional[Mask] = None,
                 is_absolute: bool = True, scale=None, shift=None,
                 is_planar: bool = True, projection: str = "pinhole",
                 names=("C", "H", "W"), **kwargs):
        if isinstance(x, str):
            from .io.depth import load_depth
            x = load_depth(x)
            names = ("C", "H", "W")
        super().__init__(x, names=names, **kwargs)
        self.add_child("occlusion", occlusion, align_dim=["B", "T"], mergeable=True)
        self.add_property("scale", scale)
        self.add_property("shift", shift)
        self.add_property("is_absolute", is_absolute)
        self.add_property("is_planar", is_planar)
        self.add_property("projection", projection)

    def append_occlusion(self, occlusion: Mask, name: Optional[str] = None):
        self._append_child("occlusion", occlusion, name)


    def __get_view__(self, title=None, min_depth=None, max_depth=None,
                     cmap="nipy_spectral", reverse: bool = True, **kwargs):
        """Colormapped depth (depth.py:183 __get_view__)."""
        from .renderer import View
        import matplotlib
        arr = np.asarray(self.as_numpy(), np.float64)
        while arr.ndim > 2:
            arr = arr[0]
        arr = np.nan_to_num(arr, posinf=0, neginf=0)
        lo = min_depth if min_depth is not None else arr.min()
        hi = max_depth if max_depth is not None else max(arr.max(), lo + 1e-6)
        norm = np.clip((arr - lo) / (hi - lo), 0, 1)
        if reverse:
            norm = 1 - norm
        img = matplotlib.colormaps[cmap](norm)[..., :3].astype(np.float32)
        return View(img, title=title)

    # ------------------------------------------------------------------
    def encode_inverse(self, prior_clamp_min=None, prior_clamp_max=None,
                       post_clamp_min=None, post_clamp_max=None) -> "Depth":
        """absolute depth -> scaled inverse depth (depth.py:63)."""
        if not self.is_absolute:
            return self.clone()
        shift = self.shift if self.shift is not None else 0
        scale = self.scale if self.scale is not None else 1
        arr = np.array(self.as_numpy())
        if prior_clamp_min is not None or prior_clamp_max is not None:
            arr = np.clip(arr, prior_clamp_min, prior_clamp_max)
        arr = (1.0 / arr - shift) / scale
        if post_clamp_min is not None or post_clamp_max is not None:
            arr = np.clip(arr, post_clamp_min, post_clamp_max)
        n = self._with_array(arr)
        n._properties = dict(self._properties)
        n.scale = None
        n.shift = None
        n.is_absolute = False
        return n

    def encode_absolute(self, scale=1, shift=0, prior_clamp_min=None,
                        prior_clamp_max=None, post_clamp_min=None,
                        post_clamp_max=None, keep_negative: bool = False) -> "Depth":
        """inverse depth -> absolute depth = 1 / (scale * d + shift)
        (depth.py:106)."""
        if self.is_absolute:
            return self.clone()
        arr = np.array(self.as_numpy())
        if prior_clamp_min is not None or prior_clamp_max is not None:
            arr = np.clip(arr, prior_clamp_min, prior_clamp_max)
        arr = scale * arr + shift
        if not keep_negative:
            arr = np.clip(arr, 0, None)
        with np.errstate(divide="ignore"):
            arr = 1.0 / arr
        if post_clamp_min is not None or post_clamp_max is not None:
            arr = np.clip(arr, post_clamp_min, post_clamp_max)
        n = self._with_array(arr)
        n._properties = dict(self._properties)
        n.scale = scale
        n.shift = shift
        n.is_absolute = True
        return n

    # ------------------------------------------------------------------
    def _intrinsic_or_raise(self, camera_intrinsic):
        intrinsic = camera_intrinsic if camera_intrinsic is not None \
            else self.get_child("cam_intrinsic")
        if intrinsic is None or isinstance(intrinsic, dict):
            raise ValueError("camera_intrinsic required (attach one or pass it)")
        return intrinsic

    def _pinhole_rays(self, intrinsic):
        K = np.asarray(intrinsic.as_numpy()).reshape(-1, intrinsic.shape[-2], 4)[0]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        ys, xs = np.meshgrid(np.arange(self.H, dtype=np.float32),
                             np.arange(self.W, dtype=np.float32), indexing="ij")
        dx = (xs - cx) / fx
        dy = (ys - cy) / fy
        return dx, dy

    def as_planar(self, camera_intrinsic=None, **kwargs) -> "Depth":
        """euclidean (ray length) -> planar Z (depth.py:426)."""
        if self.is_planar:
            return self.clone()
        intrinsic = self._intrinsic_or_raise(camera_intrinsic)
        dx, dy = self._pinhole_rays(intrinsic)
        norm = np.sqrt(dx * dx + dy * dy + 1.0)
        n = self._with_array(self.as_numpy() / norm)
        n.is_planar = True
        return n

    def as_euclidean(self, camera_intrinsic=None, **kwargs) -> "Depth":
        """planar Z -> euclidean ray length (depth.py:380)."""
        if not self.is_planar:
            return self.clone()
        intrinsic = self._intrinsic_or_raise(camera_intrinsic)
        dx, dy = self._pinhole_rays(intrinsic)
        norm = np.sqrt(dx * dx + dy * dy + 1.0)
        n = self._with_array(self.as_numpy() * norm)
        n.is_planar = False
        return n

    def as_points3d(self, camera_intrinsic=None):
        """Back-project each pixel to 3D camera coords (depth.py:211)."""
        from .points_3d import Points3D
        intrinsic = self._intrinsic_or_raise(camera_intrinsic)
        depth = self if self.is_planar else self.as_planar(intrinsic)
        dx, dy = self._pinhole_rays(intrinsic)
        z = np.asarray(depth.as_numpy())
        lead_shape = [s for s, n in zip(self.shape, self._names)
                      if n not in ("C", "H", "W")]
        z = z.reshape(lead_shape + [self.H, self.W]) if lead_shape else z.reshape(self.H, self.W)
        pts = np.stack([dx * z, dy * z, z * np.ones_like(dx)], axis=-1)
        pts = np.nan_to_num(pts.reshape(lead_shape + [self.H * self.W, 3]
                                        if lead_shape else (self.H * self.W, 3)),
                            nan=0.0, posinf=0.0, neginf=0.0)
        names = tuple([n for n in self._names if n not in ("C", "H", "W")] + ["N", None])
        return Points3D(pts.astype(np.float32), names=names)

    def as_disp(self, camera_side: Optional[str] = None,
                baseline: Optional[float] = None, camera_intrinsic=None):
        """depth -> disparity = baseline * focal / depth (depth.py:324)."""
        from .disparity import Disparity
        baseline = baseline if baseline is not None else self.baseline
        camera_side = camera_side if camera_side is not None else self.camera_side
        intrinsic = self._intrinsic_or_raise(camera_intrinsic)
        if baseline is None:
            raise ValueError("baseline required for depth->disparity")
        K = np.asarray(intrinsic.as_numpy()).reshape(-1, intrinsic.shape[-2], 4)[0]
        focal = K[0, 0]
        depth = np.asarray(self.as_numpy())
        with np.errstate(divide="ignore"):
            disp = baseline * focal / depth
        disp = np.nan_to_num(disp, posinf=0.0, neginf=0.0)
        out = Disparity(disp.astype(np.float32), disp_format="unsigned",
                        names=self._names, baseline=baseline,
                        camera_side=camera_side)
        out.append_cam_intrinsic(intrinsic.clone())
        return out

    def _resize(self, size01, **kwargs):
        # depth values are size-invariant (unlike disparity/flow)
        return super()._resize(size01, **kwargs)
