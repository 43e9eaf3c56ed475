"""Frame: the image type with a normalization state machine and label children.

Re-design of /root/reference/aloscene/frame.py:91. A Frame carries pixel data
in any named layout (default CHW to mirror the reference API; ``as_layout``
exports TPU-native BHWC to models) and the full reference child set:
points2d/3d, boxes2d/3d, flow, disparity, depth, segmentation, labels, pose,
scene_flow (frame.py:119-129).

Normalization states (frame.py:386-548): "255", "01", "minmax_sym", or a
named mean/std norm (e.g. "resnet"); converters are exact functional specs of
the reference's ``norm01``/``norm255``/``norm_minmax_sym``/``mean_std_norm``.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .augmented import AugmentedArray, xp
from .renderer import View
from .spatial import SpatialAugmentedArray

RESNET_MEAN_STD = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))


class Frame(SpatialAugmentedArray):

    def __init__(self, x, boxes2d=None, boxes3d=None, labels=None, flow=None,
                 segmentation=None, disparity=None, points2d=None, points3d=None,
                 depth=None, pose=None, scene_flow=None,
                 normalization: str = "255", mean_std: Optional[Tuple] = None,
                 names=("C", "H", "W"), **kwargs):
        if isinstance(x, str):
            from .io.image import load_image
            x = load_image(x)
            normalization = "255"
            names = ("C", "H", "W")
        super().__init__(x, names=names, **kwargs)
        # children (frame.py:119-129)
        self.add_child("points2d", points2d, align_dim=["B", "T"], mergeable=False)
        self.add_child("points3d", points3d, align_dim=["B", "T"], mergeable=False)
        self.add_child("boxes2d", boxes2d, align_dim=["B", "T"], mergeable=False)
        self.add_child("boxes3d", boxes3d, align_dim=["B", "T"], mergeable=False)
        self.add_child("flow", flow, align_dim=["B", "T"], mergeable=False)
        self.add_child("disparity", disparity, align_dim=["B", "T"], mergeable=True)
        self.add_child("depth", depth, align_dim=["B", "T"], mergeable=True)
        self.add_child("segmentation", segmentation, align_dim=["B", "T"], mergeable=False)
        self.add_child("labels", labels, align_dim=["B", "T"], mergeable=True)
        self.add_child("pose", pose, align_dim=["B", "T"], mergeable=True)
        self.add_child("scene_flow", scene_flow, align_dim=["B", "T"], mergeable=False)

        if mean_std is not None:
            mean_std = (tuple(mean_std[0]), tuple(mean_std[1]))
        if normalization in ("255", "01", "minmax_sym"):
            assert mean_std is None
        else:
            assert mean_std is not None, \
                f"named normalization '{normalization}' requires mean_std"
        self.add_property("normalization", normalization)
        self.add_property("mean_std", mean_std)

    # append helpers (frame.py:181-357)
    def append_boxes2d(self, boxes, name=None): self._append_child("boxes2d", boxes, name)
    def append_boxes3d(self, boxes, name=None): self._append_child("boxes3d", boxes, name)
    def append_points2d(self, pts, name=None): self._append_child("points2d", pts, name)
    def append_points3d(self, pts, name=None): self._append_child("points3d", pts, name)
    def append_flow(self, flow, name=None): self._append_child("flow", flow, name)
    def append_disparity(self, disp, name=None): self._append_child("disparity", disp, name)
    def append_depth(self, depth, name=None): self._append_child("depth", depth, name)
    def append_segmentation(self, seg, name=None): self._append_child("segmentation", seg, name)
    def append_labels(self, labels, name=None): self._append_child("labels", labels, name)
    def append_pose(self, pose, name=None): self._append_child("pose", pose, name)
    def append_scene_flow(self, sf, name=None): self._append_child("scene_flow", sf, name)

    # ------------------------------------------------------------------
    # normalization state machine (frame.py:386-548)
    # ------------------------------------------------------------------
    def _mean_std_arrays(self, mean_std):
        n_shape = [1] * self.ndim
        n_shape[self.dim_idx("C")] = len(mean_std[0])
        m = xp(self.array)
        mean = m.asarray(np.array(mean_std[0], dtype=np.float32).reshape(n_shape))
        std = m.asarray(np.array(mean_std[1], dtype=np.float32).reshape(n_shape))
        return mean, std

    def _renorm(self, array, normalization, mean_std=None) -> "Frame":
        n = self._with_array(array)
        n._properties = dict(self._properties)
        n.normalization = normalization
        n.mean_std = mean_std
        return n

    def norm01(self) -> "Frame":
        t = self
        if t.normalization == "01":
            return t.clone()
        if t.normalization == "255":
            return t._renorm(t.array / 255.0, "01")
        if t.normalization == "minmax_sym":
            return t._renorm((t.array + 1.0) / 2.0, "01")
        if t.mean_std is not None:
            mean, std = t._mean_std_arrays(t.mean_std)
            return t._renorm(t.array * std + mean, "01")
        raise ValueError(f"cannot convert from {t.normalization} to 01")

    def norm255(self) -> "Frame":
        t = self
        if t.normalization == "255":
            return t.clone()
        if t.normalization == "01":
            return t._renorm(t.array * 255.0, "255")
        if t.normalization == "minmax_sym":
            return t._renorm((t.array + 1.0) * 255.0 / 2.0, "255")
        if t.mean_std is not None:
            mean, std = t._mean_std_arrays(t.mean_std)
            return t._renorm((t.array * std + mean) * 255.0, "255")
        raise ValueError(f"cannot convert from {t.normalization} to 255")

    def norm_minmax_sym(self) -> "Frame":
        t = self
        if t.normalization == "minmax_sym":
            return t.clone()
        if t.normalization == "01":
            return t._renorm(2 * t.array - 1.0, "minmax_sym")
        if t.normalization == "255":
            return t._renorm(2 * (t.array / 255.0) - 1.0, "minmax_sym")
        if t.mean_std is not None:
            return t.norm01().norm_minmax_sym()
        raise ValueError(f"cannot convert from {t.normalization} to minmax_sym")

    def mean_std_norm(self, mean, std, name: str) -> "Frame":
        t = self
        mean, std = tuple(mean), tuple(std)
        if t.mean_std is not None and t.mean_std == (mean, std):
            return t.clone()
        t01 = t if t.normalization == "01" else t.norm01()
        mean_a, std_a = t01._mean_std_arrays((mean, std))
        return t01._renorm((t01.array - mean_a) / std_a, name, (mean, std))

    def norm_resnet(self) -> "Frame":
        return self.mean_std_norm(*RESNET_MEAN_STD, name="resnet")

    def norm_as(self, target: "Frame") -> "Frame":
        if target.normalization == "01":
            return self.norm01()
        if target.normalization == "255":
            return self.norm255()
        if target.normalization == "minmax_sym":
            return self.norm_minmax_sym()
        if target.mean_std is not None:
            return self.mean_std_norm(*target.mean_std, name=target.normalization)
        raise ValueError(f"cannot match normalization {target.normalization}")

    def as_image(self, dtype=np.uint8) -> np.ndarray:
        """HWC uint8 view (frame.py:359)."""
        f = self.norm255()
        arr = np.asarray(f.as_numpy())
        perm = [f.dim_idx("H"), f.dim_idx("W"), f.dim_idx("C")]
        lead = [i for i in range(arr.ndim) if i not in perm]
        return np.transpose(arr, lead + perm).astype(dtype)

    def __get_view__(self, title=None, **kwargs):
        """(frame.py:550) view = norm01 HWC image."""
        from .renderer import View
        f = self.norm01()
        arr = f.as_numpy()
        perm = [f.dim_idx("H"), f.dim_idx("W"), f.dim_idx("C")]
        lead = [i for i in range(arr.ndim) if i not in perm]
        img = np.transpose(arr, lead + perm)
        while img.ndim > 3:
            img = img[0]
        return View(img, title=title)

    # ------------------------------------------------------------------
    # norm-aware geometric overrides (frame.py:557-657)
    # ------------------------------------------------------------------
    _PAD_VALUES = {"01": 0.0, "255": 0.0, "minmax_sym": -1.0}

    def _pad(self, offset_y, offset_x, **kwargs):
        kwargs.pop("fill", None)
        if self.normalization in self._PAD_VALUES:
            return super()._pad(offset_y, offset_x,
                                fill=self._PAD_VALUES[self.normalization], **kwargs)
        if self.mean_std is not None:
            # padded pixels must equal the normalized value of black:
            # (0 - mean) / std, per channel (frame.py:557-608)
            pad_top = int(round(offset_y[0] * self.H))
            pad_bottom = int(round(offset_y[1] * self.H))
            pad_left = int(round(offset_x[0] * self.W))
            pad_right = int(round(offset_x[1] * self.W))
            n_shape = list(self.shape)
            n_shape[self.dim_idx("H")] += pad_top + pad_bottom
            n_shape[self.dim_idx("W")] += pad_left + pad_right
            mean, std = self._mean_std_arrays(self.mean_std)
            m = xp(self.array)
            base = m.broadcast_to((0.0 - mean) / std, tuple(n_shape))
            sl = self.get_slices({
                "H": slice(pad_top, n_shape[self.dim_idx("H")] - pad_bottom),
                "W": slice(pad_left, n_shape[self.dim_idx("W")] - pad_right)})
            if isinstance(self.array, np.ndarray):
                buf = np.array(base)
                buf[sl] = self.array
            else:
                buf = base.at[sl].set(self.array)
            return self._with_array(buf.astype(self.dtype))
        raise ValueError(f"_pad unsupported for normalization {self.normalization}")

    def _spatial_shift(self, shift_y, shift_x, **kwargs):
        """Roll + mean-fill (frame.py:610-657)."""
        arr = self.as_numpy()
        c_idx = self.dim_idx("C")
        reduce_axes = tuple(i for i in range(arr.ndim) if i != c_idx)
        mean = arr.mean(axis=reduce_axes, keepdims=True)
        y = int(shift_y * self.H)
        x = int(shift_x * self.W)
        out = np.roll(arr, x, axis=self.dim_idx("W"))
        if x >= 1:
            out[self.get_slices({"W": slice(0, x)})] = mean
        elif x <= -1:
            out[self.get_slices({"W": slice(x, None)})] = mean
        out = np.roll(out, y, axis=self.dim_idx("H"))
        if y >= 1:
            out[self.get_slices({"H": slice(0, y)})] = mean
        elif y <= -1:
            out[self.get_slices({"H": slice(y, None)})] = mean
        return self._with_array(out)
