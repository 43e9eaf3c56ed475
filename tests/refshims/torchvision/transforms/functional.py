"""Tensor-only subset of torchvision.transforms.functional used by the
reference aloscene/backbone code paths that the parity tests exercise."""

import torch
import torch.nn.functional as F


def _mode(interpolation):
    if interpolation is None:
        return "bilinear"
    value = getattr(interpolation, "value", interpolation)
    return str(value)


def resize(img: torch.Tensor, size, interpolation=None, antialias=None):
    if isinstance(size, int):
        size = [size, size]
    size = list(size)
    unbatched = img.dim() == 3
    if unbatched:
        img = img[None]
    mode = _mode(interpolation)
    kwargs = {}
    if mode in ("bilinear", "bicubic"):
        kwargs = dict(align_corners=False, antialias=bool(antialias))
    orig_dtype = img.dtype
    if not img.is_floating_point():
        img = img.float()
    out = F.interpolate(img, size=size, mode=mode, **kwargs)
    if orig_dtype in (torch.uint8, torch.bool, torch.int32, torch.int64):
        out = out.round().to(orig_dtype)
    return out[0] if unbatched else out


def hflip(img: torch.Tensor):
    return img.flip(-1)


def vflip(img: torch.Tensor):
    return img.flip(-2)


def crop(img: torch.Tensor, top, left, height, width):
    return img[..., top:top + height, left:left + width]


def pad(img: torch.Tensor, padding, fill=0, padding_mode="constant"):
    # torchvision padding order: left, top, right, bottom
    if isinstance(padding, int):
        padding = [padding] * 4
    left, top, right, bottom = padding
    return F.pad(img, (left, right, top, bottom), mode=padding_mode,
                 value=fill)


def rotate(img, angle, **kwargs):
    raise NotImplementedError("shim: rotate not needed by parity tests")


def gaussian_blur(img, kernel_size, sigma=None):
    raise NotImplementedError("shim: gaussian_blur not needed by parity tests")


def rgb_to_grayscale(img, num_output_channels=1):
    w = torch.tensor([0.2989, 0.587, 0.114], dtype=img.dtype,
                     device=img.device)
    g = (img[..., :3, :, :] * w[:, None, None]).sum(-3, keepdim=True)
    return g.expand(*img.shape[:-3], num_output_channels, *img.shape[-2:])
