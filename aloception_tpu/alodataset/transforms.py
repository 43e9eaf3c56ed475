"""Label-aware augmentation library.

Re-design of /root/reference/alodataset/transforms.py (AloTransform base:17
and its 26 transforms). The architecture is preserved — ``sample_params`` /
``set_params`` / ``apply`` so parameters can be shared across temporal
sequences (``same_on_sequence``) and across dict-of-frames
(``same_on_frames``) — but pixel ops run on host numpy/cv2 (the data
pipeline) while everything geometric routes through the aloscene ops so
labels transform with the frames.
"""

from __future__ import annotations

import random
from typing import List, Mapping, Optional, Tuple, Union

import numpy as np

from ..aloscene import Frame
from ..aloscene.spatial import SpatialAugmentedArray, _cat_batched


def _concat_temporal(frames: List[Frame]) -> Frame:
    """Concatenate single frames along a new T dim."""
    temporal = [f.temporal() for f in frames]
    return _cat_batched(temporal, axis_name="T")


class AloTransform:
    """(transforms.py:17)"""

    def __init__(self, same_on_sequence: Union[bool, float] = True,
                 same_on_frames: Union[bool, float] = False, p: float = 1.0):
        self.same_on_sequence = same_on_sequence
        self.same_on_frames = same_on_frames
        self.sample_params()
        self.p = p

    def _init_same_on(self) -> Tuple[bool, bool]:
        def _to_bool(v):
            if isinstance(v, bool):
                return v
            if isinstance(v, float):
                if not 0 <= v <= 1:
                    raise ValueError("probability must be within [0, 1]")
                return np.random.rand() < v
            raise TypeError("same_on_* must be bool or float")
        return _to_bool(self.same_on_sequence), _to_bool(self.same_on_frames)

    def sample_params(self) -> tuple:
        raise NotImplementedError

    def set_params(self, *params):
        raise NotImplementedError

    def apply(self, frame: Frame, **kwargs) -> Frame:
        raise NotImplementedError

    def __call__(self, frames, **kwargs):
        if not random.random() < self.p:
            return frames

        same_seq, same_frames = self._init_same_on()
        seq_params = {}
        frame_params = None

        if isinstance(frames, Mapping):
            out = {}
            for key, f in frames.items():
                if "T" in f.names and same_frames and not same_seq:
                    steps = []
                    for t in range(f.shape[f.dim_idx("T")]):
                        if t not in seq_params:
                            seq_params[t] = self.sample_params()
                        self.set_params(*seq_params[t])
                        r = self.apply(f[t], **kwargs)
                        if r.HW != f[t].HW:
                            raise RuntimeError(
                                "size-changing transform cannot vary within a sequence")
                        steps.append(r)
                    out[key] = _concat_temporal(steps)
                elif "T" in f.names and not same_frames and not same_seq:
                    steps = []
                    for t in range(f.shape[f.dim_idx("T")]):
                        self.set_params(*self.sample_params())
                        r = self.apply(f[t], **kwargs)
                        if r.HW != f[t].HW:
                            raise RuntimeError(
                                "size-changing transform cannot vary within a sequence")
                        steps.append(r)
                    out[key] = _concat_temporal(steps)
                elif same_frames:
                    frame_params = frame_params or self.sample_params()
                    self.set_params(*frame_params)
                    out[key] = self.apply(f, **kwargs)
                else:
                    self.set_params(*self.sample_params())
                    out[key] = self.apply(f, **kwargs)
            return out

        f = frames
        if "T" in f.names and not same_seq:
            steps = []
            for t in range(f.shape[f.dim_idx("T")]):
                self.set_params(*self.sample_params())
                steps.append(self.apply(f[t], **kwargs))
            return _concat_temporal(steps)
        self.set_params(*self.sample_params())
        return self.apply(f, **kwargs)


class Compose(AloTransform):
    """(transforms.py:152)"""

    def __init__(self, transforms: List[AloTransform], *args, **kwargs):
        self.transforms = transforms
        super().__init__(*args, **kwargs)

    def sample_params(self):
        return ([t.sample_params() for t in self.transforms],)

    def set_params(self, params):
        for p, t in zip(params, self.transforms):
            t.set_params(*p)

    def apply(self, frame, **kwargs):
        for t in self.transforms:
            frame = t(frame, **kwargs)
        return frame

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{type(self).__name__}(\n{inner}\n)"


class RandomSelect(AloTransform):
    """Apply transforms1 with prob p else transforms2 (transforms.py:202)."""

    def __init__(self, transforms1, transforms2, p: float = 0.5, *a, **kw):
        self.transforms1 = transforms1
        self.transforms2 = transforms2
        self.p_select = p
        super().__init__(*a, **kw)

    def sample_params(self):
        self._r = random.random()
        return (self._r, self.transforms1.sample_params(),
                self.transforms2.sample_params())

    def set_params(self, _r, p1, p2):
        self._r = _r
        self.transforms1.set_params(*p1)
        self.transforms2.set_params(*p2)

    def apply(self, frame, **kwargs):
        if self._r < self.p_select:
            return self.transforms1(frame, **kwargs)
        return self.transforms2(frame, **kwargs)


class RandomHorizontalFlip(AloTransform):
    """(transforms.py:246)"""

    def __init__(self, p: float = 0.5, *a, **kw):
        self.p_flip = p
        super().__init__(*a, **kw)
        self.p = 1.0  # gating happens via the sampled _r like the reference

    def sample_params(self):
        self._r = random.random()
        return (self._r,)

    def set_params(self, _r):
        self._r = _r

    def apply(self, frame, **kwargs):
        if self._r < self.p_flip:
            return frame.hflip()
        return frame


class RandomVerticalFlip(AloTransform):
    def __init__(self, p: float = 0.5, *a, **kw):
        self.p_flip = p
        super().__init__(*a, **kw)
        self.p = 1.0

    def sample_params(self):
        self._r = random.random()
        return (self._r,)

    def set_params(self, _r):
        self._r = _r

    def apply(self, frame, **kwargs):
        if self._r < self.p_flip:
            return frame.vflip()
        return frame


class RandomSizeCrop(AloTransform):
    """Crop a region with w/h sampled in [min_size, max_size]
    (transforms.py:283)."""

    def __init__(self, min_size, max_size, *a, **kw):
        if type(min_size) is not type(max_size):
            raise TypeError("min_size and max_size must share a type")
        self.min_size = min_size
        self.max_size = max_size
        super().__init__(*a, **kw)

    def sample_params(self):
        if isinstance(self.min_size, int):
            self._w = random.randint(self.min_size, self.max_size)
            self._h = random.randint(self.min_size, self.max_size)
        else:
            self._w = np.random.uniform(self.min_size, self.max_size)
            self._h = np.random.uniform(self.min_size, self.max_size)
        self._top = random.random()
        self._left = random.random()
        return (self._w, self._h, self._top, self._left)

    def set_params(self, w, h, top, left):
        self._w, self._h, self._top, self._left = w, h, top, left

    def apply(self, frame, **kwargs):
        if isinstance(self._w, float):
            sample_w = int(round(self._w * frame.W))
            sample_h = int(round(self._h * frame.H))
        else:
            sample_w, sample_h = self._w, self._h
        w = min(frame.W, sample_w)
        h = min(frame.H, sample_h)
        top = int(self._top * (frame.H - h + 1))
        left = int(self._left * (frame.W - w + 1))
        return frame.crop((top / frame.H, (top + h) / frame.H),
                          (left / frame.W, (left + w) / frame.W))


class RandomCrop(AloTransform):
    """Fixed-size random crop (transforms.py:419)."""

    def __init__(self, size: Tuple[int, int], *a, **kw):
        self.size = size
        super().__init__(*a, **kw)

    def sample_params(self):
        self._top = np.random.uniform()
        self._left = np.random.uniform()
        return (self._top, self._left)

    def set_params(self, top, left):
        self._top, self._left = top, left

    def apply(self, frame, **kwargs):
        H, W = frame.HW
        h, w = self.size
        top = int(self._top * (H - h + 1))
        left = int(self._left * (W - w + 1))
        return frame.crop((top / H, (top + h) / H), (left / W, (left + w) / W))


class RandomPad(AloTransform):
    """Pad up to max_size with a random left/top split (transforms.py:383)."""

    def __init__(self, max_size, frame_size, **kw):
        if isinstance(max_size, int):
            max_size = (max_size, max_size)
        self.max_size = max_size
        self.frame_size = frame_size
        super().__init__(**kw)

    def sample_params(self):
        h, w = self.frame_size
        pad_w = max(self.max_size[1] - w, 0)
        pad_h = max(self.max_size[0] - h, 0)
        left = random.randint(0, pad_w)
        top = random.randint(0, pad_h)
        self._pads = (left, pad_w - left, top, pad_h - top)
        return self._pads

    def set_params(self, l, r, t, b):
        self._pads = (l, r, t, b)

    def apply(self, frame, **kwargs):
        l, r, t, b = self._pads
        return frame.pad(offset_y=(t, b), offset_x=(l, r), pad_boxes=True)


class RandomSizePad(RandomPad):
    """Like RandomPad but the pad amount itself is random (transforms.py:342)."""

    def sample_params(self):
        h, w = self.frame_size
        pad_w = random.randint(0, max(self.max_size[1] - w, 0))
        pad_h = random.randint(0, max(self.max_size[0] - h, 0))
        left = random.randint(0, pad_w)
        top = random.randint(0, pad_h)
        self._pads = (left, pad_w - left, top, pad_h - top)
        return self._pads


class RandomResizeWithAspectRatio(AloTransform):
    """Resize so the short side equals a sampled size, long side <= max_size
    (transforms.py:451)."""

    def __init__(self, sizes: List[int], max_size: Optional[int] = None, *a, **kw):
        self.sizes = sizes
        self.max_size = max_size
        super().__init__(*a, **kw)

    @staticmethod
    def get_size_with_aspect_ratio(frame, size: int, max_size=None):
        h, w = frame.H, frame.W
        if max_size is not None:
            mn, mx = float(min(w, h)), float(max(w, h))
            if mx / mn * size > max_size:
                size = int(round(max_size * mn / mx))
        if (w <= h and w == size) or (h <= w and h == size):
            return (h, w)
        if w < h:
            return (int(size * h / w), size)
        return (size, int(size * w / h))

    def sample_params(self):
        self._size = random.choice(self.sizes)
        return (self._size,)

    def set_params(self, size):
        self._size = size

    def apply(self, frame, **kwargs):
        return frame.resize(
            self.get_size_with_aspect_ratio(frame, self._size, self.max_size))


class Resize(AloTransform):
    """(transforms.py:526)"""

    def __init__(self, size: Tuple[int, int], *a, **kw):
        assert isinstance(size, tuple)
        self.size = size
        super().__init__(*a, **kw)

    def sample_params(self):
        return (self.size,)

    def set_params(self, size):
        self.size = size

    def apply(self, frame, **kwargs):
        return frame.resize(self.size)


class Rotate(AloTransform):
    """(transforms.py:560)"""

    def __init__(self, angle: float, center=None, *a, **kw):
        self.angle = float(angle)
        self.center = center
        super().__init__(*a, **kw)

    def sample_params(self):
        return (self.angle, self.center)

    def set_params(self, angle, center):
        self.angle, self.center = angle, center

    def apply(self, frame, **kwargs):
        return frame.rotate(self.angle, self.center)


class RealisticNoise(AloTransform):
    """Gaussian + shot noise (transforms.py:596)."""

    def __init__(self, gaussian_std: float = 0.02, shot_std: float = 0.05,
                 same_on_sequence=False, *a, **kw):
        self.gaussian_std = gaussian_std
        self.shot_std = shot_std
        super().__init__(*a, same_on_sequence=same_on_sequence, **kw)

    def sample_params(self):
        return tuple()

    def set_params(self):
        pass

    def apply(self, frame, **kwargs):
        n = frame.norm01()
        arr = np.asarray(n.as_numpy())
        g = np.random.normal(0, self.gaussian_std, arr.shape).astype(np.float32)
        s = np.random.normal(0, self.shot_std, arr.shape).astype(np.float32)
        noisy = np.clip(arr + arr * arr * s + g, 0, 1)
        out = n._with_array(noisy)
        if out.normalization != frame.normalization:
            out = out.norm_as(frame)
        return out


class CustomRandomColoring(AloTransform):
    """gamma/brightness/per-channel color scaling (transforms.py:640)."""

    def __init__(self, gamma_r=(0.8, 1.2), brightness_r=(0.5, 2.0),
                 colors_r=(0.5, 1.5), *a, **kw):
        self.gamma_r = gamma_r
        self.brightness_r = brightness_r
        self.colors_r = colors_r
        super().__init__(*a, **kw)

    def sample_params(self):
        self.gamma = np.random.uniform(*self.gamma_r)
        self.brightness = np.random.uniform(*self.brightness_r)
        self.colors = np.random.uniform(*self.colors_r, size=3)
        return (self.gamma, self.brightness, self.colors)

    def set_params(self, gamma, brightness, colors):
        self.gamma, self.brightness, self.colors = gamma, brightness, colors

    def apply(self, frame, **kwargs):
        assert frame.normalization == "01", "normalize to 01 before coloring"
        arr = np.asarray(frame.as_numpy()) ** self.gamma * self.brightness
        c_idx = frame.dim_idx("C")
        shape = [1] * arr.ndim
        shape[c_idx] = arr.shape[c_idx]
        colors = np.resize(self.colors, arr.shape[c_idx]).reshape(shape)
        return frame._with_array(np.clip(arr * colors, 0, 1).astype(np.float32))


class SpatialShift(AloTransform):
    """(transforms.py:684)"""

    def __init__(self, size: Tuple[float, float], *a, **kw):
        assert isinstance(size, tuple)
        self.size = size
        super().__init__(*a, **kw)

    def sample_params(self):
        self.percentage = np.random.uniform(self.size[0], self.size[1], 2)
        return (self.percentage,)

    def set_params(self, percentage):
        self.percentage = percentage

    def apply(self, frame, **kwargs):
        return frame.spatial_shift(float(self.percentage[0]),
                                   float(self.percentage[1]))


class GrayScale(AloTransform):
    """(transforms.py:717)"""

    def sample_params(self):
        return tuple()

    def set_params(self):
        pass

    def apply(self, frame, **kwargs):
        n = frame.norm01()
        arr = np.asarray(n.as_numpy())
        c_idx = frame.dim_idx("C")
        weights = np.array([0.299, 0.587, 0.114], np.float32)
        shape = [1] * arr.ndim
        shape[c_idx] = 3
        gray = (arr * weights.reshape(shape)).sum(axis=c_idx, keepdims=True)
        gray = np.repeat(gray, arr.shape[c_idx], axis=c_idx)
        out = n._with_array(gray.astype(np.float32))
        if out.normalization != frame.normalization:
            out = out.norm_as(frame)
        return out


class ColorJitter(AloTransform):
    """brightness/contrast/saturation/hue jitter (transforms.py:755)."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
                 *a, **kw):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        super().__init__(*a, **kw)

    def sample_params(self):
        def _f(v, center=1.0):
            return np.random.uniform(max(0, center - v), center + v)
        self._b = _f(self.brightness)
        self._c = _f(self.contrast)
        self._s = _f(self.saturation)
        self._h = np.random.uniform(-self.hue, self.hue)
        self._order = np.random.permutation(4)
        return (self._b, self._c, self._s, self._h, self._order)

    def set_params(self, b, c, s, h, order):
        self._b, self._c, self._s, self._h, self._order = b, c, s, h, order

    def apply(self, frame, **kwargs):
        import cv2
        n = frame.norm01()
        hwc = np.asarray(n.as_layout(
            tuple(x for x in n.names if x not in ("H", "W", "C")) + ("H", "W", "C")))
        lead = hwc.shape[:-3]
        img = hwc.reshape((-1,) + hwc.shape[-3:])
        outs = []
        for im in img:
            for op in self._order:
                if op == 0:
                    im = np.clip(im * self._b, 0, 1)
                elif op == 1:
                    mean = im.mean()
                    im = np.clip((im - mean) * self._c + mean, 0, 1)
                elif op == 2:
                    g = im @ np.array([0.299, 0.587, 0.114], np.float32)
                    im = np.clip((im - g[..., None]) * self._s + g[..., None], 0, 1)
                else:
                    hsv = cv2.cvtColor(im.astype(np.float32), cv2.COLOR_RGB2HSV)
                    hsv[..., 0] = (hsv[..., 0] + self._h * 360) % 360
                    im = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
            outs.append(im)
        out_hwc = np.stack(outs).reshape(lead + hwc.shape[-3:])
        # back to the frame's layout
        perm_names = tuple(x for x in n.names if x not in ("H", "W", "C")) + ("H", "W", "C")
        inv = [perm_names.index(x) for x in n.names]
        out = n._with_array(np.transpose(out_hwc, inv).astype(np.float32))
        if out.normalization != frame.normalization:
            out = out.norm_as(frame)
        return out


class RandomDownScale(AloTransform):
    """Downscale by a random factor (transforms.py:832)."""

    def __init__(self, min_size: Tuple[int, int], preserve_ratio: bool = False,
                 *a, **kw):
        self.min_size = min_size
        self.preserve_ratio = preserve_ratio
        super().__init__(*a, **kw)

    def sample_params(self):
        self._h_coef = np.random.uniform()
        self._w_coef = self._h_coef if self.preserve_ratio else np.random.uniform()
        return (self._h_coef, self._w_coef)

    def set_params(self, h_coef, w_coef):
        self._h_coef, self._w_coef = h_coef, w_coef

    def apply(self, frame, **kwargs):
        H, W = frame.HW
        mh, mw = self.min_size
        h = int(mh + self._h_coef * max(H - mh, 0))
        w = int(mw + self._w_coef * max(W - mw, 0))
        if self.preserve_ratio:
            ratio = min(h / H, w / W)
            h, w = int(H * ratio), int(W * ratio)
        return frame.resize((max(h, 1), max(w, 1)))


class RandomDownScaleCrop(Compose):
    """Downscale then crop back to size (transforms.py:883)."""

    def __init__(self, size: Tuple[int, int], preserve_ratio: bool = False,
                 *a, **kw):
        super().__init__([
            RandomDownScale(size, preserve_ratio, *a, **kw),
            RandomCrop(size, *a, **kw)], *a, **kw)


class DynamicCropTransform(AloTransform):
    """Crop of fixed size around a runtime-provided center (transforms.py:904)."""

    def __init__(self, crop_size: Tuple[int, int], *a, **kw):
        self.crop_size = crop_size
        super().__init__(*a, **kw)

    def sample_params(self):
        return (self.crop_size,)

    def set_params(self, size):
        self.crop_size = size

    def apply(self, frame, center=(0.5, 0.5), **kwargs):
        H, W = frame.HW
        h, w = self.crop_size
        cy = center[0] * H if isinstance(center[0], float) else center[0]
        cx = center[1] * W if isinstance(center[1], float) else center[1]
        top = int(np.clip(cy - h / 2, 0, H - h))
        left = int(np.clip(cx - w / 2, 0, W - w))
        return frame.crop((top / H, (top + h) / H), (left / W, (left + w) / W))


def _box_blur_1d(arr, size: int, axis: int):
    """Separable box blur along one axis (cumsum trick)."""
    if size <= 1:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (size // 2, size - size // 2 - 1)
    a = np.pad(arr, pad, mode="edge")
    c = np.cumsum(a, axis=axis, dtype=np.float32)
    lead = np.take(c, range(size - 1, a.shape[axis]), axis=axis)
    lag = np.concatenate([np.zeros_like(np.take(c, [0], axis=axis)),
                          np.take(c, range(0, a.shape[axis] - size), axis=axis)],
                         axis=axis)
    return (lead - lag) / size


class RandomFocusBlur(AloTransform):
    """Directional box blur with random h/v kernel sizes (transforms.py:946)."""

    def __init__(self, max_filter_size: int = 10, *a, **kw):
        self.max_filter_size = max_filter_size
        super().__init__(*a, **kw)

    def sample_params(self):
        self._h = random.randint(1, self.max_filter_size)
        self._v = random.randint(1, self.max_filter_size)
        return (self._h, self._v)

    def set_params(self, h, v):
        self._h, self._v = h, v

    def apply(self, frame, **kwargs):
        arr = np.asarray(frame.as_numpy(), np.float32)
        arr = _box_blur_1d(arr, self._h, frame.dim_idx("W"))
        arr = _box_blur_1d(arr, self._v, frame.dim_idx("H"))
        return frame._with_array(arr.astype(np.float32))


class RandomFocusBlurV2(RandomFocusBlur):
    """Blur blended with the sharp image (transforms.py:1000)."""

    def apply(self, frame, **kwargs):
        blurred = super().apply(frame, **kwargs)
        alpha = min(self._h, self._v) / max(self.max_filter_size, 1)
        arr = (1 - alpha) * np.asarray(frame.as_numpy(), np.float32) \
            + alpha * np.asarray(blurred.as_numpy(), np.float32)
        return frame._with_array(arr.astype(np.float32))


class RandomFocusBlurV3(RandomFocusBlurV2):
    """V2 with stronger direction anisotropy (transforms.py:1069)."""

    def sample_params(self):
        self._h = random.randint(1, self.max_filter_size)
        self._v = 1 if random.random() < 0.5 else random.randint(
            1, self.max_filter_size)
        return (self._h, self._v)


class RandomFlowMotionBlur(AloTransform):
    """Motion blur along the attached optical flow direction
    (transforms.py:1095): blurs with a line kernel oriented by the mean flow."""

    def __init__(self, max_kernel_size: int = 15, *a, **kw):
        self.max_kernel_size = max_kernel_size
        super().__init__(*a, **kw)

    def sample_params(self):
        self._strength = random.random()
        return (self._strength,)

    def set_params(self, strength):
        self._strength = strength

    def apply(self, frame, **kwargs):
        import cv2
        flow = frame.get_child("flow")
        if flow is None or isinstance(flow, dict):
            return frame
        fl = np.asarray(flow.as_numpy())
        angle = float(np.arctan2(fl[1].mean(), fl[0].mean()))
        size = max(int(self._strength * self.max_kernel_size), 1)
        if size <= 1:
            return frame
        kernel = np.zeros((size, size), np.float32)
        c = size // 2
        for i in range(size):
            x = int(round(c + (i - c) * np.cos(angle)))
            y = int(round(c + (i - c) * np.sin(angle)))
            if 0 <= x < size and 0 <= y < size:
                kernel[y, x] = 1.0
        kernel /= max(kernel.sum(), 1.0)
        hwc = np.asarray(frame.as_layout(("H", "W", "C"))) \
            if frame.ndim == 3 else None
        if hwc is None:
            return frame
        blurred = cv2.filter2D(hwc.astype(np.float32), -1, kernel)
        c_idx = frame.dim_idx("C")
        out = np.moveaxis(blurred, -1, c_idx) if c_idx != frame.ndim - 1 else blurred
        return frame._with_array(out.astype(np.float32))


class RandomCornersMask(AloTransform):
    """Zero out image corners with a random radius (transforms.py:1233) —
    fisheye-lens vignetting simulation (WoodScape)."""

    def __init__(self, max_radius_ratio: float = 0.5, *a, **kw):
        self.max_radius_ratio = max_radius_ratio
        super().__init__(*a, **kw)

    def sample_params(self):
        self._ratio = np.random.uniform(0, self.max_radius_ratio)
        return (self._ratio,)

    def set_params(self, ratio):
        self._ratio = ratio

    def apply(self, frame, **kwargs):
        H, W = frame.HW
        r = self._ratio * min(H, W)
        if r < 1:
            return frame
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        corners = np.stack([
            np.sqrt(ys ** 2 + xs ** 2),
            np.sqrt(ys ** 2 + (W - 1 - xs) ** 2),
            np.sqrt((H - 1 - ys) ** 2 + xs ** 2),
            np.sqrt((H - 1 - ys) ** 2 + (W - 1 - xs) ** 2)])
        keep = (corners.min(0) >= r)
        arr = np.asarray(frame.as_numpy(), np.float32).copy()
        h_idx, w_idx = frame.dim_idx("H"), frame.dim_idx("W")
        shape = [1] * arr.ndim
        shape[h_idx], shape[w_idx] = H, W
        arr = arr * keep.reshape(shape)
        return frame._with_array(arr)


class IRAugmentation(Compose):
    """Infrared-domain augmentation stack (transforms.py:1309): grayscale +
    noise + blur, simulating IR sensor statistics on RGB data."""

    def __init__(self, *a, **kw):
        super().__init__([
            GrayScale(),
            RealisticNoise(gaussian_std=0.03, shot_std=0.08),
            RandomFocusBlurV2(max_filter_size=5),
        ], *a, **kw)
