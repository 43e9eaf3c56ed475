"""Flow / SceneFlow maps (reference: aloscene/flow.py:9, scene_flow.py:11)."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .spatial import SpatialAugmentedArray
from .mask import Mask


class Flow(SpatialAugmentedArray):
    """2-channel optical flow in pixel units, with optional occlusion Mask.

    Value semantics under geometry (flow.py:46-94): resize scales x/y flow by
    the size ratio; hflip/vflip negate the corresponding component.
    """

    def __init__(self, x, occlusion: Optional[Mask] = None,
                 names=("C", "H", "W"), **kwargs):
        if isinstance(x, str):
            from .io.flow import load_flow
            x = load_flow(x)
            names = ("C", "H", "W")
        super().__init__(x, names=names, **kwargs)
        self.add_child("occlusion", occlusion, align_dim=["B", "T"], mergeable=True)

    def append_occlusion(self, occlusion: Mask, name: Optional[str] = None):
        self._append_child("occlusion", occlusion, name)


    def __get_view__(self, title=None, clip_flow=None, magnitude_max=None,
                     **kwargs):
        """Flow-wheel color view (flow.py:46)."""
        from .renderer import View
        from .utils.flow_utils import flow_to_color
        arr = np.asarray(self.as_numpy())
        while arr.ndim > 3:
            arr = arr[0]
        f = np.moveaxis(arr, self.dim_idx("C") if arr.ndim == 3 else 0, -1)
        return View(flow_to_color(f[..., :2], clip_flow,
                                  magnitude_max=magnitude_max) / 255.0,
                    title=title)

    def _scale_components(self, out, sx: float, sy: float):
        arr = np.array(out.as_numpy())
        slx = out.get_slices({"C": 0})
        sly = out.get_slices({"C": 1})
        arr[slx] = arr[slx] * sx
        arr[sly] = arr[sly] * sy
        return out._with_array(arr)

    def _resize(self, size01, **kwargs):
        H0, W0 = self.H, self.W
        out = super()._resize(size01, **kwargs)
        return self._scale_components(out, out.W / W0, out.H / H0)

    def _hflip(self, **kwargs):
        out = super()._hflip(**kwargs)
        return self._scale_components(out, -1.0, 1.0)

    def _vflip(self, **kwargs):
        out = super()._vflip(**kwargs)
        return self._scale_components(out, 1.0, -1.0)


class SceneFlow(SpatialAugmentedArray):
    """3-channel 3D scene flow (scene_flow.py:11)."""

    def __init__(self, x, occlusion: Optional[Mask] = None,
                 names=("C", "H", "W"), **kwargs):
        super().__init__(x, names=names, **kwargs)
        self.add_child("occlusion", occlusion, align_dim=["B", "T"], mergeable=True)

    def append_occlusion(self, occlusion: Mask, name: Optional[str] = None):
        self._append_child("occlusion", occlusion, name)

    @staticmethod
    def from_optical_flow(flow: Flow, depth1, depth2, intrinsic):
        """Lift optical flow to 3D scene flow via two depth maps + intrinsics
        (scene_flow.py:52): sf = P2(x + flow, Z2) - P1(x, Z1)."""
        f = flow.as_numpy()
        assert f.shape[0] == 2
        H, W = f.shape[1:]
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        pts1 = depth1.as_points3d(intrinsic).as_numpy().reshape(H, W, 3)
        x2 = xs + f[0]
        y2 = ys + f[1]
        z2 = depth2.as_numpy().reshape(H, W)
        K = np.asarray(intrinsic.as_numpy()).reshape(3, 3)
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        pts2 = np.stack([(x2 - cx) / fx * z2, (y2 - cy) / fy * z2, z2], axis=-1)
        sf = (pts2 - pts1).transpose(2, 0, 1).astype(np.float32)
        out = SceneFlow(sf, names=("C", "H", "W"))
        occ = flow.get_child("occlusion")
        if occ is not None and not isinstance(occ, dict):
            out.append_occlusion(occ.clone())
        return out
