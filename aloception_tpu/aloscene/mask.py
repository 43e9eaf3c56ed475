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
