"""Spatial augmented arrays: base for every (..., H, W)-structured type.

TPU-native re-design of the reference ``SpatialAugmentedTensor``
(/root/reference/aloscene/tensors/spatial_augmented_tensor.py:18): adds the
camera-calibration children, stereo properties, H/W helpers, temporal/batch
dim insertion, the ``batch_list`` pad-to-max batching (the device-batch
entry point of the whole framework) and the spatial geometric ops.

Layout note: unlike the reference (fixed torchvision C,H,W), ops here are
named-dim driven, so both CHW (reference-compatible) and HWC (TPU-native,
what conv kernels consume) layouts work.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from .augmented import AugmentedArray, xp, _child_op


class SpatialAugmentedArray(AugmentedArray):
    """Base for all H,W data (spatial_augmented_tensor.py:18)."""

    def __init__(self, x, names=None, cam_intrinsic=None, cam_extrinsic=None,
                 baseline=None, camera_side=None, mask=None, **kwargs):
        super().__init__(x, names=names, **kwargs)
        if "H" not in self._names or "W" not in self._names:
            # default trailing ... H, W naming if caller gave none
            if names is None and self.ndim >= 2:
                n = [None] * self.ndim
                n[-2], n[-1] = "H", "W"
                self._names = tuple(n)
        self.add_property("baseline", baseline)
        self.add_property("camera_side", camera_side)
        self.add_child("mask", mask, align_dim=["B", "T"], mergeable=True)
        self.add_child("cam_intrinsic", cam_intrinsic, align_dim=["B", "T"], mergeable=True)
        self.add_child("cam_extrinsic", cam_extrinsic, align_dim=["B", "T"], mergeable=True)

    # ------------------------------------------------------------------
    @property
    def H(self) -> int:
        return self.shape[self.dim_idx("H")]

    @property
    def W(self) -> int:
        return self.shape[self.dim_idx("W")]

    @property
    def HW(self) -> Tuple[int, int]:
        return (self.H, self.W)

    def append_mask(self, mask, name: Optional[str] = None):
        self._append_child("mask", mask, name)

    def append_cam_intrinsic(self, cam_intrinsic, name: Optional[str] = None):
        self._append_child("cam_intrinsic", cam_intrinsic, name)

    def append_cam_extrinsic(self, cam_extrinsic, name: Optional[str] = None):
        self._append_child("cam_extrinsic", cam_extrinsic, name)

    def _children_op_kwargs(self, op: str, kwargs: dict) -> dict:
        """Inject spatial context into child geometric ops
        (spatial_augmented_tensor.py:445-476, 589)."""
        ck = dict(kwargs)
        if op in ("_hflip", "_vflip", "_crop", "_pad"):
            ck.setdefault("frame_size", self.HW)
        if op in ("_hflip", "_vflip"):
            ci = self._children.get("cam_intrinsic")
            ce = self._children.get("cam_extrinsic")
            if ci is not None:
                ck.setdefault("cam_intrinsic", ci)
            if ce is not None:
                ck.setdefault("cam_extrinsic", ce)
        return ck

    def relative_to_absolute(self, x: float, dim: str) -> int:
        size = self.H if dim.lower() == "h" else self.W
        return int(round(x * size))

    # ------------------------------------------------------------------
    # temporal/batch dim insertion (spatial_augmented_tensor.py:218-320)
    # ------------------------------------------------------------------
    def _insert_dim(self, dim_name: str, dim: int):
        if dim_name in self._names:
            return self
        new_array = xp(self.array).expand_dims(self.array, dim) \
            if hasattr(xp(self.array), "expand_dims") else self.array[None]
        n_names = list(self._names)
        n_names.insert(dim, dim_name)
        new = self._with_array(new_array, names=tuple(n_names))

        def _up(c):
            if isinstance(c, AugmentedArray):
                return c._insert_dim(dim_name, dim) if isinstance(c, SpatialAugmentedArray) \
                    else c._with_array(
                        xp(c.array).expand_dims(c.array, dim),
                        names=tuple(list(c._names[:dim]) + [dim_name] + list(c._names[dim:])))
            return c
        n_children = {}
        for name, child in new._children.items():
            if new._child_meta[name]["mergeable"]:
                n_children[name] = new.apply_on_child(child, _up)
            else:
                n_children[name] = child
        new._children = n_children
        return new

    def temporal(self, dim: Optional[int] = None):
        """Insert a temporal dim (spatial_augmented_tensor.py:218)."""
        if "T" in self._names:
            return self
        if dim is None:
            dim = 1 if self._names[0] == "B" else 0
        return self._insert_dim("T", dim)

    def batch(self, dim: int = 0):
        """Insert a batch dim (spatial_augmented_tensor.py:275)."""
        if "B" in self._names:
            return self
        return self._insert_dim("B", dim)

    # ------------------------------------------------------------------
    # batch_list: pad-to-max batching with padded-area Mask
    # (spatial_augmented_tensor.py:322-419, exposed as aloscene.batch_list)
    # ------------------------------------------------------------------
    @staticmethod
    def batch_list(sa_arrays: Union[List, Dict], pad_boxes: bool = False,
                   pad_points2d: bool = False, intersection: bool = False,
                   size=None):
        """Pad to the per-batch max (reference semantics,
        spatial_augmented_tensor.py:322) or, with ``size=(H, W)``, to a
        fixed canonical shape — the hook the bucketed multi-scale training
        geometry uses to bound XLA recompilation to one compile per bucket.
        """
        from .mask import Mask

        if isinstance(sa_arrays, dict) or (
                len(sa_arrays) and isinstance(sa_arrays[0], dict)):
            if isinstance(sa_arrays, list):  # list of dicts -> dict of lists
                keys = sa_arrays[0].keys()
                sa_arrays = {k: [d[k] for d in sa_arrays] for k in keys}
            return {k: SpatialAugmentedArray.batch_list(
                v, pad_boxes=pad_boxes, pad_points2d=pad_points2d,
                intersection=intersection, size=size)
                for k, v in sa_arrays.items()}

        frames = [f for f in sa_arrays if f is not None]
        assert len(frames) >= 1
        max_h = max(f.H for f in frames)
        max_w = max(f.W for f in frames)
        if size is not None:
            assert size[0] >= max_h and size[1] >= max_w, (
                f"batch_list size {size} smaller than batch max "
                f"({max_h}, {max_w})")
            max_h, max_w = int(size[0]), int(size[1])

        padded, masks = [], []
        for f in frames:
            h_pad = (0, max_h - f.H)
            w_pad = (0, max_w - f.W)
            fb = f.batch()
            pf = fb.pad(h_pad, w_pad, pad_boxes=pad_boxes, pad_points2d=pad_points2d)
            padded.append(pf)
            m = np.ones(_mask_shape(pf), dtype=np.float32)
            m[pf.get_slices({"H": slice(None, f.H), "W": slice(None, f.W)})] = 0.0
            masks.append(m)

        out = _cat_batched(padded, intersection=intersection)
        mask_names = padded[0]._names
        out.append_mask(Mask(np.concatenate(masks, axis=0), names=mask_names))
        return out

    @staticmethod
    def temporal_list(sa_arrays: List["SpatialAugmentedArray"]):
        """Stack same-shape frames along a NEW temporal axis T — the
        sequence-building pattern (reference: torch.cat of .temporal()
        frames, tutorials/4.1-sequence.py; spatial_augmented_tensor.py:218).
        Children stack with the frames; use batch_list first when shapes
        differ."""
        frames = [f.temporal() for f in sa_arrays if f is not None]
        assert len(frames) >= 1
        return _cat_batched(frames, axis_name="T")

    # ------------------------------------------------------------------
    # spatial geometric primitive ops
    # ------------------------------------------------------------------
    def _hflip(self, **kwargs):
        assert "H" in self._names and "W" in self._names
        ax = self.dim_idx("W")
        return self._with_array(xp(self.array).flip(self.array, axis=ax))

    def _vflip(self, **kwargs):
        ax = self.dim_idx("H")
        return self._with_array(xp(self.array).flip(self.array, axis=ax))

    def _resize(self, size01, method: str = "bilinear", **kwargs):
        """Resize payload by relative ratios (spatial_augmented_tensor.py:523).

        Host numpy data goes through cv2 INTER_LINEAR — plain bilinear with
        half-pixel centers, matching the reference's torchvision
        antialias=False and the native C++ loader. Traced arrays use
        jax.image.resize (which anti-aliases downsampling — the only path
        divergence, and only under jit).
        """
        h = self.relative_to_absolute(size01[0], "h")
        w = self.relative_to_absolute(size01[1], "w")
        n_shape = list(self.shape)
        n_shape[self.dim_idx("H")] = h
        n_shape[self.dim_idx("W")] = w
        if 0 in self.shape:  # empty tensor: reshape only
            return self._with_array(np.zeros(tuple(n_shape), dtype=self.dtype))
        if isinstance(self.array, np.ndarray):
            import cv2
            interp = cv2.INTER_LINEAR if method == "bilinear" \
                else cv2.INTER_NEAREST
            h_idx, w_idx = self.dim_idx("H"), self.dim_idx("W")
            perm = [h_idx, w_idx] + [i for i in range(self.ndim)
                                     if i not in (h_idx, w_idx)]
            a = np.transpose(self.array, perm).astype(np.float32)
            lead = a.shape[2:]
            a = a.reshape(a.shape[0], a.shape[1], -1)
            chunks = [cv2.resize(a[..., i:i + 4], (w, h), interpolation=interp)
                      for i in range(0, a.shape[-1], 4)]
            chunks = [c[..., None] if c.ndim == 2 else c for c in chunks]
            out = np.concatenate(chunks, axis=-1).reshape((h, w) + lead)
            out = np.transpose(out, np.argsort(perm)).astype(self.dtype)
            return self._with_array(out)
        out = jax.image.resize(jnp.asarray(self.array, dtype=jnp.float32),
                               tuple(n_shape), method=method)
        out = out.astype(self.dtype) if self.dtype != np.float32 else out
        return self._with_array(out)

    def _rotate(self, angle, center=None, fill: float = 0.0, **kwargs):
        """Rotate payload by `angle` degrees counter-clockwise around `center`
        (absolute (x, y); default image center), same output shape
        (spatial_augmented_tensor.py:546). Host-side (cv2)."""
        import cv2
        arr = self.as_numpy()
        H, W = self.H, self.W
        if center is None:
            center = (W / 2, H / 2)
        M = cv2.getRotationMatrix2D(tuple(float(c) for c in center), float(angle), 1.0)
        h_idx, w_idx = self.dim_idx("H"), self.dim_idx("W")
        # move H, W to the leading axes, collapse trailing, warp each channel
        perm = [h_idx, w_idx] + [i for i in range(arr.ndim) if i not in (h_idx, w_idx)]
        inv = np.argsort(perm)
        a = np.transpose(arr, perm).reshape(H, W, -1)
        warped = cv2.warpAffine(a.astype(np.float32), M, (W, H),
                                flags=cv2.INTER_LINEAR,
                                borderMode=cv2.BORDER_CONSTANT, borderValue=fill)
        if warped.ndim == 2:
            warped = warped[:, :, None]
        out = warped.reshape([H, W] + [arr.shape[i] for i in perm[2:]])
        out = np.transpose(out, inv).astype(arr.dtype)
        return self._with_array(out)

    def _crop(self, H_crop, W_crop, **kwargs):
        hmin = self.relative_to_absolute(H_crop[0], "h")
        hmax = self.relative_to_absolute(H_crop[1], "h")
        wmin = self.relative_to_absolute(W_crop[0], "w")
        wmax = self.relative_to_absolute(W_crop[1], "w")
        slices = self.get_slices({"H": slice(hmin, hmax), "W": slice(wmin, wmax)})
        return self._with_array(self.array[slices])

    def _pad(self, offset_y, offset_x, fill: float = 0.0, **kwargs):
        pad_top = int(round(offset_y[0] * self.H))
        pad_bottom = int(round(offset_y[1] * self.H))
        pad_left = int(round(offset_x[0] * self.W))
        pad_right = int(round(offset_x[1] * self.W))
        widths = [(0, 0)] * self.ndim
        widths[self.dim_idx("H")] = (pad_top, pad_bottom)
        widths[self.dim_idx("W")] = (pad_left, pad_right)
        m = xp(self.array)
        return self._with_array(
            m.pad(self.array, widths, mode="constant", constant_values=fill))

    def _spatial_shift(self, shift_y: float, shift_x: float, fill: float = 0.0, **kwargs):
        """Roll + constant fill of the uncovered band
        (spatial_augmented_tensor semantics; Frame overrides fill w/ mean)."""
        y = int(shift_y * self.H)
        x = int(shift_x * self.W)
        arr = np.array(self.as_numpy())
        arr = np.roll(arr, x, axis=self.dim_idx("W"))
        if x >= 1:
            arr[self.get_slices({"W": slice(0, x)})] = fill
        elif x <= -1:
            arr[self.get_slices({"W": slice(x, None)})] = fill
        arr = np.roll(arr, y, axis=self.dim_idx("H"))
        if y >= 1:
            arr[self.get_slices({"H": slice(0, y)})] = fill
        elif y <= -1:
            arr[self.get_slices({"H": slice(y, None)})] = fill
        return self._with_array(arr)

    # ------------------------------------------------------------------
    # getitem: H/W slicing becomes a crop on children
    # (spatial_augmented_tensor.py:628-703)
    # ------------------------------------------------------------------
    def _getitem_child(self, child, child_name: str, idx):
        hw_crop = [None, None]
        dim = 0
        for sl in (idx if isinstance(idx, tuple) else (idx,)):
            if sl is Ellipsis:
                dim += self.ndim - (len(idx) - 1)
                continue
            name = self._names[dim]
            if isinstance(sl, slice) and (sl.start is not None or sl.stop is not None):
                if name == "H":
                    start = 0 if sl.start is None else sl.start
                    stop = self.H if sl.stop is None else sl.stop
                    hw_crop[0] = (start / self.H, stop / self.H)
                elif name == "W":
                    start = 0 if sl.start is None else sl.start
                    stop = self.W if sl.stop is None else sl.stop
                    hw_crop[1] = (start / self.W, stop / self.W)
            dim += 1
        out = super()._getitem_child(child, child_name, idx)
        if hw_crop[0] is not None or hw_crop[1] is not None:
            H_crop = hw_crop[0] or (0.0, 1.0)
            W_crop = hw_crop[1] or (0.0, 1.0)
            out = self.apply_on_child(
                out, lambda c: c.crop(H_crop, W_crop, frame_size=self.HW)
                if hasattr(c, "crop") else c)
        return out

    # ------------------------------------------------------------------
    # rendering (spatial_augmented_tensor.py:115-202 get_view)
    # ------------------------------------------------------------------
    def __get_view__(self, title=None, **kwargs):
        from .renderer import View
        arr = self.as_numpy()
        if "C" in self._names:
            perm = [self.dim_idx("H"), self.dim_idx("W"), self.dim_idx("C")]
        else:
            perm = [self.dim_idx("H"), self.dim_idx("W")]
        lead = [i for i in range(arr.ndim) if i not in perm]
        img = np.transpose(arr, lead + perm)
        while img.ndim > 3:
            img = img[0]
        return View(img, title=title)

    def get_view(self, views: Optional[list] = None, exclude=None, size=None,
                 title=None, **kwargs):
        """Recursive view: the frame plus each renderable child drawn on it
        (spatial_augmented_tensor.py:115)."""
        from .renderer import View
        views = list(views) if views else []
        exclude = exclude or []
        base = self.__get_view__(title=title, **kwargs)
        frame_img = base.image.copy()
        for name, child in self._children.items():
            if child is None or name in exclude or name in ("mask",
                                                            "cam_intrinsic",
                                                            "cam_extrinsic"):
                continue
            def _draw(c):
                nonlocal frame_img
                fn = getattr(c, "__get_view__", None)
                if fn is None:
                    return c
                try:
                    ci = self._children.get("cam_intrinsic")
                    v = fn(frame=frame_img, frame_size=self.HW,
                           cam_intrinsic=ci if not isinstance(ci, dict) else None)
                    if v is not None:
                        frame_img = v.image
                except TypeError:
                    pass
                return c
            self.apply_on_child(child, _draw)
        views.insert(0, View(frame_img, title=title))
        if size is not None:
            import cv2
            for v in views:
                v.image = cv2.resize(v.image, (size[1], size[0]))
        out = views[0]
        for v in views[1:]:
            out = out.add(v)
        return out

    def render(self, **kwargs):
        self.get_view().render(**kwargs)

    # convenient layout export for models: named transpose
    def as_layout(self, names: Tuple[str, ...]):
        """Transpose payload to the given named layout (e.g. ("B","H","W","C"))
        and return the raw array — the boundary into model code."""
        perm = [self.dim_idx(n) for n in names]
        m = xp(self.array)
        return m.transpose(self.array, perm)


def _mask_shape(frame: SpatialAugmentedArray) -> Tuple[int, ...]:
    shape = list(frame.shape)
    if "C" in frame._names:
        shape[frame.dim_idx("C")] = 1
    return tuple(shape)


def _cat_batched(frames: List[SpatialAugmentedArray], intersection: bool = False,
                 axis_name: str = "B"):
    """Concatenate same-shape batched frames along a named axis, merging
    children: mergeable children are concatenated, unmergeable become
    per-item lists (the reference's torch.cat __torch_function__ merge,
    augmented_tensor.py:435-570).
    """
    f0 = frames[0]
    axis = f0.dim_idx(axis_name)
    data = np.concatenate([f.as_numpy() for f in frames], axis=axis)
    out = f0._with_array(data)

    # properties: equal values survive; differing values -> None (or error)
    props = dict(f0._properties)
    for f in frames[1:]:
        for k, v in f._properties.items():
            if props.get(k) != v:
                if intersection:
                    props[k] = None
                else:
                    raise ValueError(
                        f"batch_list: property '{k}' differs across tensors "
                        f"({props.get(k)} vs {v}); pass intersection=True")
    out._properties = props

    child_names = set(f0._children)
    for f in frames[1:]:
        child_names &= set(f._children)

    n_children: Dict[str, Any] = {}
    for name in f0._child_meta:
        if name not in child_names:
            n_children[name] = None
            continue
        vals = [f._children.get(name) for f in frames]
        present = [v is not None for v in vals]
        if not any(present):
            n_children[name] = None
            continue
        if not all(present):
            if intersection:
                n_children[name] = None
                continue
            if not f0._child_meta[name]["mergeable"]:
                # unmergeable children tolerate gaps: per-item list w/ None
                # (e.g. flow attached to frame t but not t+1, FlyingChairs2)
                items: List[Any] = []
                for v in vals:
                    items.extend(v if isinstance(v, list) else [v])
                n_children[name] = items
                continue
            raise ValueError(
                f"batch_list: child '{name}' missing on some tensors; "
                "pass intersection=True to drop it")
        if f0._child_meta[name]["mergeable"]:
            if isinstance(vals[0], dict):
                n_children[name] = {
                    k: _merge_children([v[k] for v in vals], axis)
                    for k in vals[0]}
            else:
                n_children[name] = _merge_children(vals, axis)
        else:
            # unmergeable: flatten to a per-item list
            items: List[Any] = []
            for v in vals:
                items.extend(v if isinstance(v, list) else [v])
            n_children[name] = items
    out._children = n_children
    return out


def _merge_children(children: List[AugmentedArray], axis: int):
    c0 = children[0]
    data = np.concatenate([c.as_numpy() for c in children], axis=axis)
    out = c0._with_array(data)
    # recurse: merge sub-children of mergeable children
    subs: Dict[str, Any] = {}
    for name, meta in c0._child_meta.items():
        vals = [c._children.get(name) for c in children]
        if all(v is None for v in vals):
            subs[name] = None
        elif meta["mergeable"] and all(isinstance(v, AugmentedArray) for v in vals):
            subs[name] = _merge_children(vals, axis)
        else:
            items: List[Any] = []
            for v in vals:
                items.extend(v if isinstance(v, list) else [v])
            subs[name] = items
    out._children = subs
    return out
