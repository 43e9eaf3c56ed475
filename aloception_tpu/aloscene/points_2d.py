"""Points2D keypoints (reference: aloscene/points_2d.py:21).

Formats ``xy``/``yx`` × absolute/relative, with the full geometric op set
(points_2d.py:403-717): hflip/vflip mirror coordinates, crop translates and
drops points that fall outside, pad records padded_size like boxes.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from .augmented import AugmentedArray
from .labels import Labels

FORMATS = ("xy", "yx")


class Points2D(AugmentedArray):

    def __init__(self, x, points_format: str, absolute: bool,
                 labels: Union[dict, Labels, None] = None,
                 frame_size: Optional[Tuple[int, int]] = None,
                 names=("N", None), **kwargs):
        super().__init__(x, names=names, **kwargs)
        if points_format not in FORMATS:
            raise ValueError(f"format '{points_format}' not in {FORMATS}")
        if absolute and frame_size is None:
            raise ValueError("absolute points require frame_size")
        self.add_property("points_format", points_format)
        self.add_property("absolute", absolute)
        self.add_property("padded_size", None)
        self.add_property("frame_size",
                          tuple(frame_size) if frame_size is not None else None)
        self.add_child("labels", labels, align_dim=["N"], mergeable=True)

    def append_labels(self, labels: Labels, name: Optional[str] = None):
        self._append_child("labels", labels, name)

    # format / position state ------------------------------------------------
    def xy(self) -> "Points2D":
        n = self.clone()
        if n.points_format == "xy":
            return n
        n.array = n.array[..., ::-1] if isinstance(n.array, np.ndarray) \
            else n.array[..., ::-1]
        n.points_format = "xy"
        return n

    def yx(self) -> "Points2D":
        n = self.clone()
        if n.points_format == "yx":
            return n
        n.array = n.array[..., ::-1]
        n.points_format = "yx"
        return n

    def get_with_format(self, fmt: str) -> "Points2D":
        return self.xy() if fmt == "xy" else self.yx()

    def _scale_vec(self, frame_size):
        h, w = frame_size
        return np.array([w, h] if self.points_format == "xy" else [h, w],
                        dtype=np.float32)

    def abs_pos(self, frame_size: Tuple[int, int]) -> "Points2D":
        n = self.clone()
        frame_size = tuple(frame_size)
        if n.absolute and frame_size != n.frame_size:
            n.array = n.array / n._scale_vec(n.frame_size)
            n.absolute = False
        if not n.absolute:
            n.array = n.array * n._scale_vec(frame_size)
            n.frame_size = frame_size
            n.absolute = True
        return n

    def rel_pos(self) -> "Points2D":
        n = self.clone()
        if n.absolute:
            n.array = n.array / n._scale_vec(n.frame_size)
        n.absolute = False
        n.frame_size = None
        return n

    # geometric ops ------------------------------------------------------
    def _hflip(self, **kwargs):
        absolute, frame_size, fmt = self.absolute, self.frame_size, self.points_format
        pts = self.rel_pos().xy()
        arr = np.array(np.asarray(pts.array))
        arr[..., 0] = 1.0 - arr[..., 0]
        pts.array = arr
        if absolute:
            pts = pts.abs_pos(frame_size)
        return pts.get_with_format(fmt)

    def _vflip(self, **kwargs):
        absolute, frame_size, fmt = self.absolute, self.frame_size, self.points_format
        pts = self.rel_pos().xy()
        arr = np.array(np.asarray(pts.array))
        arr[..., 1] = 1.0 - arr[..., 1]
        pts.array = arr
        if absolute:
            pts = pts.abs_pos(frame_size)
        return pts.get_with_format(fmt)

    def _resize(self, size01, **kwargs):
        pts = self.clone()
        if not pts.absolute:
            return pts
        abs_size = tuple(s * fs for s, fs in zip(size01, pts.frame_size))
        return pts.abs_pos(abs_size)

    def _crop(self, H_crop, W_crop, **kwargs):
        if self.padded_size is not None:
            raise RuntimeError("cannot crop padded points; fit_to_padded_size() first")
        absolute, frame_size, fmt = self.absolute, self.frame_size, self.points_format
        pts = self.rel_pos().xy()
        arr = np.array(np.asarray(pts.array))
        y0, y1 = H_crop
        x0, x1 = W_crop
        arr[..., 0] = (arr[..., 0] - x0) / (x1 - x0)
        arr[..., 1] = (arr[..., 1] - y0) / (y1 - y0)
        pts.array = arr
        inside = (arr[..., 0] >= 0) & (arr[..., 0] <= 1) & \
                 (arr[..., 1] >= 0) & (arr[..., 1] <= 1)
        pts = pts[inside]
        if absolute:
            n_frame_size = ((H_crop[1] - H_crop[0]) * frame_size[0],
                            (W_crop[1] - W_crop[0]) * frame_size[1])
            pts = pts.abs_pos(n_frame_size)
        return pts.get_with_format(fmt)

    def _pad(self, offset_y, offset_x, pad_points2d: bool = True, **kwargs):
        if not pad_points2d:
            n = self.clone()
            if n.padded_size is None:
                n.padded_size = ((offset_y[0], offset_y[1]), (offset_x[0], offset_x[1]))
            else:
                ps = n.padded_size
                n.padded_size = ((ps[0][0] + offset_y[0], ps[0][1] + offset_y[1]),
                                 (ps[1][0] + offset_x[0], ps[1][1] + offset_x[1]))
            return n
        absolute, frame_size, fmt = self.absolute, self.frame_size, self.points_format
        pts = self.rel_pos().xy()
        arr = np.array(np.asarray(pts.array))
        sy = 1.0 + offset_y[0] + offset_y[1]
        sx = 1.0 + offset_x[0] + offset_x[1]
        arr[..., 0] = (arr[..., 0] + offset_x[0]) / sx
        arr[..., 1] = (arr[..., 1] + offset_y[0]) / sy
        pts.array = arr
        if absolute:
            pts = pts.abs_pos((frame_size[0] * sy, frame_size[1] * sx))
        return pts.get_with_format(fmt)

    def fit_to_padded_size(self) -> "Points2D":
        if self.padded_size is None:
            raise RuntimeError("no padded_size recorded")
        ps = self.padded_size
        n = self.remove_padding()
        return n._pad((ps[0][0], ps[0][1]), (ps[1][0], ps[1][1]), pad_points2d=True)

    def remove_padding(self) -> "Points2D":
        n = self.clone()
        n.padded_size = None
        return n

    def _spatial_shift(self, shift_y, shift_x, **kwargs):
        absolute, frame_size, fmt = self.absolute, self.frame_size, self.points_format
        pts = self.rel_pos().xy()
        arr = np.array(np.asarray(pts.array))
        arr[..., 0] += shift_x
        arr[..., 1] += shift_y
        pts.array = arr
        inside = (arr[..., 0] >= 0) & (arr[..., 0] <= 1) & \
                 (arr[..., 1] >= 0) & (arr[..., 1] <= 1)
        pts = pts[inside]
        if absolute:
            pts = pts.abs_pos(frame_size)
        return pts.get_with_format(fmt)

    def as_points(self, points: "Points2D") -> "Points2D":
        n = self.clone()
        if points.absolute and not n.absolute:
            n = n.abs_pos(points.frame_size)
        elif not points.absolute and n.absolute:
            n = n.rel_pos()
        return n.get_with_format(points.points_format)
