"""Mask: (N|1, H, W) float occupancy masks with optional Labels.

Re-design of /root/reference/aloscene/mask.py:15 (iou_with:51,
mask2id panoptic id-map:163) as a pytree spatial type.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import jax.numpy as jnp

from .spatial import SpatialAugmentedArray
from .labels import Labels


class Mask(SpatialAugmentedArray):

    def __init__(self, x, labels: Union[dict, Labels, None] = None,
                 names=("N", "H", "W"), **kwargs):
        if isinstance(x, str):
            from .io.mask import load_mask
            x = load_mask(x)
            names = ("N", "H", "W")
        super().__init__(x, names=names, **kwargs)
        self.add_child("labels", labels, align_dim=["N"], mergeable=True)

    def append_labels(self, labels: Labels, name: Optional[str] = None):
        self._append_child("labels", labels, name)


    _GLOBAL_COLOR_SET = np.random.RandomState(42).uniform(0, 1, (300, 3))

    def __get_view__(self, title=None, frame=None, frame_size=None, **kwargs):
        """Colored overlay of the mask set (mask.py:84-161). When a ``frame``
        image is given, blends the masks onto it."""
        from .renderer import View
        masks = np.asarray(self.as_numpy())
        if masks.ndim == 2:
            masks = masks[None]
        while masks.ndim > 3:
            masks = masks[0]
        H, W = masks.shape[-2:]
        overlay = np.zeros((H, W, 3), np.float32)
        labels = self.get_child("labels")
        lab = np.asarray(labels.as_numpy()).astype(int) \
            if labels is not None and not isinstance(labels, dict) else None
        for i in range(masks.shape[0]):
            color_id = lab[i] if lab is not None and i < len(lab) else i
            color = self._GLOBAL_COLOR_SET[int(color_id) % 300]
            overlay += masks[i][..., None] * color[None, None]
        overlay = np.clip(overlay, 0, 1)
        if frame is not None:
            import cv2
            if frame.shape[:2] != (H, W):
                overlay = cv2.resize(overlay, (frame.shape[1], frame.shape[0]))
            blend = np.clip(frame * 0.6 + overlay * 0.4, 0, 1)
            return View(blend, title=title)
        return View(overlay, title=title)

    def iou_with(self, mask2: "Mask", eps: float = 1e-6):
        """Pairwise IoU between two sets of masks -> (N1, N2) (mask.py:51)."""
        m1 = jnp.asarray(self.array).reshape(self.shape[0], -1)
        m2 = jnp.asarray(mask2.array).reshape(mask2.shape[0], -1)
        inter = m1 @ m2.T  # MXU-friendly
        union = m1.sum(-1)[:, None] + m2.sum(-1)[None, :] - inter
        return inter / (union + eps)

    def mask2id(self, return_cats: bool = False, background_id: int = -1):
        """Collapse an (N, H, W) binary stack into an (H, W) id map
        (mask.py:163). Pixels with no mask get ``background_id``."""
        masks = np.asarray(self.as_numpy())
        assert self.names[0] == "N"
        n = masks.shape[0]
        if n == 0:
            out = np.full(self.shape[-2:], background_id, dtype=np.int32)
            return (out, np.array([], dtype=np.int32)) if return_cats else out
        best = masks.argmax(axis=0)
        covered = masks.max(axis=0) > 0.5
        labels = self.get_child("labels")
        if labels is not None and not isinstance(labels, dict):
            cats = np.asarray(labels.as_numpy()).astype(np.int32)
            out = np.where(covered, cats[best], background_id).astype(np.int32)
        else:
            out = np.where(covered, best, background_id).astype(np.int32)
        if return_cats:
            return out, (cats if labels is not None else np.arange(n, dtype=np.int32))
        return out
