"""RAFT utilities (reference: alonet/raft/utils/utils.py:33 Padder)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


class Padder:
    """Pad NHWC inputs to the next multiple of 8, unpad outputs
    (utils/utils.py:33)."""

    def __init__(self, shape: Tuple[int, ...], mult: int = 8,
                 mode: str = "sintel"):
        H, W = shape[-3], shape[-2]
        pad_h = (-H) % mult
        pad_w = (-W) % mult
        if mode == "sintel":
            self._pad = ((pad_w // 2, pad_w - pad_w // 2),
                         (pad_h // 2, pad_h - pad_h // 2))
        else:  # kitti/chairs: pad bottom-right... reference pads top for kitti
            self._pad = ((pad_w // 2, pad_w - pad_w // 2), (pad_h, 0))

    def pad(self, *inputs):
        (wl, wr), (ht, hb) = self._pad
        outs = [jnp.pad(x, ((0, 0), (ht, hb), (wl, wr), (0, 0))) for x in inputs]
        return outs if len(outs) > 1 else outs[0]

    def unpad(self, x):
        (wl, wr), (ht, hb) = self._pad
        H, W = x.shape[-3], x.shape[-2]
        return x[..., ht:H - hb if hb else H, wl:W - wr if wr else W, :]
