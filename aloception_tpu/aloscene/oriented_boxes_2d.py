"""OrientedBoxes2D: N×5 rotated boxes [x, y, w, h, theta]
(reference: aloscene/oriented_boxes_2d.py:24).

IoU/GIoU go through the static-shape vectorized rotated-IoU op
(ops/rotated_iou.py) instead of the reference's CUDA vertex-sort kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .augmented import AugmentedArray
from .labels import Labels
from ..ops import rotated_iou as riou


class OrientedBoxes2D(AugmentedArray):

    def __init__(self, x, absolute: bool = True,
                 labels: Union[dict, Labels, None] = None,
                 frame_size: Optional[Tuple[int, int]] = None,
                 names=("N", None), **kwargs):
        super().__init__(x, names=names, **kwargs)
        if not absolute and frame_size is None:
            pass
        self.add_property("absolute", absolute)
        self.add_property("frame_size",
                          tuple(frame_size) if frame_size is not None else None)
        self.add_child("labels", labels, align_dim=["N"], mergeable=True)

    def append_labels(self, labels: Labels, name: Optional[str] = None):
        self._append_child("labels", labels, name)

    def corners(self) -> np.ndarray:
        """(N, 4, 2) corner coordinates (oriented_boxes_2d.py:76)."""
        return np.asarray(riou.box2corners(jnp.asarray(self.array)))

    def rotated_iou_with(self, boxes2: "OrientedBoxes2D") -> np.ndarray:
        """Pairwise rotated IoU (N, M) (oriented_boxes_2d.py:269)."""
        return np.asarray(riou.pairwise(
            riou.cal_iou, jnp.asarray(self.array), jnp.asarray(boxes2.array)))

    def rotated_giou_with(self, boxes2: "OrientedBoxes2D") -> np.ndarray:
        """Pairwise rotated GIoU (oriented_boxes_2d.py:330)."""
        giou, _ = riou.pairwise(
            riou.cal_giou, jnp.asarray(self.array), jnp.asarray(boxes2.array))
        return np.asarray(giou)

    def _hflip(self, frame_size=None, **kw):
        arr = np.array(self.as_numpy())
        fs = frame_size or self.frame_size
        W = fs[1] if (self.absolute and fs is not None) else 1.0
        arr[..., 0] = W - arr[..., 0]
        arr[..., 4] = -arr[..., 4]
        return self._with_array(arr)

    def _resize(self, size01, **kw):
        if not self.absolute:
            return self.clone()
        arr = np.array(self.as_numpy())
        arr[..., 0] *= size01[1]
        arr[..., 2] *= size01[1]
        arr[..., 1] *= size01[0]
        arr[..., 3] *= size01[0]
        out = self._with_array(arr)
        if self.frame_size is not None:
            out.frame_size = (self.frame_size[0] * size01[0],
                              self.frame_size[1] * size01[1])
        return out

    def _crop(self, H_crop, W_crop, frame_size=None, **kw):
        fs = frame_size or self.frame_size or (1.0, 1.0)
        arr = np.array(self.as_numpy())
        arr[..., 0] -= W_crop[0] * fs[1]
        arr[..., 1] -= H_crop[0] * fs[0]
        out = self._with_array(arr)
        if self.frame_size is not None:
            out.frame_size = ((H_crop[1] - H_crop[0]) * fs[0],
                              (W_crop[1] - W_crop[0]) * fs[1])
        return out

    def _pad(self, offset_y, offset_x, frame_size=None, **kw):
        fs = frame_size or self.frame_size or (1.0, 1.0)
        arr = np.array(self.as_numpy())
        arr[..., 0] += offset_x[0] * fs[1]
        arr[..., 1] += offset_y[0] * fs[0]
        return self._with_array(arr)

    def _vflip(self, frame_size=None, **kw):
        arr = np.array(self.as_numpy())
        fs = frame_size or self.frame_size
        H = fs[0] if (self.absolute and fs is not None) else 1.0
        arr[..., 1] = H - arr[..., 1]
        arr[..., 4] = -arr[..., 4]
        return self._with_array(arr)

    def _spatial_shift(self, sy, sx, **kw):
        fs = self.frame_size or (1.0, 1.0)
        arr = np.array(self.as_numpy())
        arr[..., 0] += sx * fs[1]
        arr[..., 1] += sy * fs[0]
        return self._with_array(arr)
