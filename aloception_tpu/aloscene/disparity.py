"""Disparity maps, signed/unsigned, with depth conversion
(reference: aloscene/disparity.py:13)."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .spatial import SpatialAugmentedArray
from .mask import Mask


class Disparity(SpatialAugmentedArray):
    """Stereo disparity. ``disp_format``: "unsigned" (distance in px) or
    "signed" (relative offset; requires camera_side). Resize scales values by
    the width ratio; hflip negates signed disparity and swaps camera_side
    (disparity.py:88-156)."""

    def __init__(self, x, occlusion: Optional[Mask] = None,
                 disp_format: str = "unsigned", png_negate: Optional[bool] = None,
                 names=("C", "H", "W"), **kwargs):
        if isinstance(x, str):
            from .io.disparity import load_disp
            x = load_disp(x, png_negate)
            names = ("C", "H", "W")
        super().__init__(x, names=names, **kwargs)
        assert disp_format in ("signed", "unsigned")
        self.add_child("occlusion", occlusion, align_dim=["B", "T"], mergeable=True)
        self.add_property("disp_format", disp_format)
        if disp_format == "unsigned" and (np.asarray(self.as_numpy()) < 0).any():
            raise ValueError("unsigned disparity must be positive")
        if disp_format == "signed" and self.camera_side is None:
            raise ValueError("signed disparity requires camera_side")

    def append_occlusion(self, occlusion: Mask, name: Optional[str] = None):
        self._append_child("occlusion", occlusion, name)


    def __get_view__(self, title=None, min_disp=None, max_disp=None,
                     cmap="nipy_spectral", **kwargs):
        """Colormapped disparity (disparity.py get_view)."""
        from .renderer import View
        import matplotlib
        arr = np.abs(np.asarray(self.as_numpy()))
        while arr.ndim > 2:
            arr = arr[0]
        lo = min_disp if min_disp is not None else arr.min()
        hi = max_disp if max_disp is not None else max(arr.max(), lo + 1e-6)
        norm = np.clip((arr - lo) / (hi - lo), 0, 1)
        img = matplotlib.colormaps[cmap](norm)[..., :3].astype(np.float32)
        return View(img, title=title)

    def _resize(self, size01, **kwargs):
        W0 = self.W
        out = super()._resize(size01, **kwargs)
        return out._with_array(out.array * (out.W / W0))

    def _hflip(self, **kwargs):
        out = super()._hflip(**kwargs)
        if self.disp_format == "signed":
            out = out._with_array(-out.array)
        opposite = {"left": "right", "right": "left", None: None}
        out.camera_side = opposite[out.camera_side]
        return out

    def unsigned(self) -> "Disparity":
        d = self.clone()
        if d.disp_format == "unsigned":
            return d
        d.disp_format = "unsigned"
        d.array = abs(d.array) if isinstance(d.array, np.ndarray) else np.abs(d.as_numpy())
        return d

    def signed(self, camera_side: Optional[str] = None) -> "Disparity":
        d = self.clone()
        if d.disp_format == "signed":
            return d
        camera_side = camera_side if camera_side is not None else d.camera_side
        if camera_side is None:
            raise ValueError("camera_side required to sign disparity")
        d.disp_format = "signed"
        if camera_side == "left":
            d.array = -d.array
        d.camera_side = camera_side
        return d

    def as_depth(self, baseline: Optional[float] = None,
                 camera_intrinsic=None, focal_length: Optional[float] = None):
        """depth = baseline * focal / disparity (disparity.py:156)."""
        from .depth import Depth
        baseline = baseline if baseline is not None else self.baseline
        if baseline is None:
            raise ValueError("baseline required for disparity->depth")
        intrinsic = camera_intrinsic if camera_intrinsic is not None \
            else self.get_child("cam_intrinsic")
        if focal_length is None:
            if intrinsic is None:
                raise ValueError("camera intrinsic or focal_length required")
            K = np.asarray(intrinsic.as_numpy())
            K = K.reshape(-1, K.shape[-2], K.shape[-1])[0]
            focal_length = float(K[0, 0])
        disp = np.abs(self.as_numpy())
        depth = np.where(disp > 0, baseline * focal_length / np.maximum(disp, 1e-9), np.inf)
        out = Depth(depth.astype(np.float32), names=self._names)
        if intrinsic is not None and not isinstance(intrinsic, dict):
            out.append_cam_intrinsic(intrinsic.clone())
        return out
