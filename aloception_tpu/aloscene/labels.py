"""Labels: 1-D class ids with optional scores and names.

Re-design of /root/reference/aloscene/labels.py:13 as a pytree node.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from .augmented import AugmentedArray


class Labels(AugmentedArray):
    """Class ids (N,) plus optional per-label ``scores`` and the static
    ``labels_names`` vocabulary / ``encoding`` ("id" | "one_hot")."""

    def __init__(self, x, encoding: str = "id",
                 labels_names: Optional[Sequence[str]] = None,
                 scores=None, names=("N",), **kwargs):
        super().__init__(x, names=names, **kwargs)
        if encoding not in ("id", "one_hot"):
            raise ValueError(f"unknown labels encoding: {encoding}")
        if labels_names is not None:
            labels_names = tuple(labels_names)
        self.add_property("encoding", encoding)
        self.add_property("labels_names", labels_names)
        if scores is not None:
            scores = np.asarray(scores, dtype=np.float32) \
                if not hasattr(scores, "shape") else scores
            assert scores.shape[0] == self.shape[0]
        self._scores = scores

    @property
    def scores(self):
        return self._scores

    @scores.setter
    def scores(self, value):
        self._scores = value

    def _tree_flatten(self):
        leaves, aux = super()._tree_flatten()
        return (leaves + (self._scores,)), aux

    @classmethod
    def _tree_unflatten(cls, aux, leaves):
        *base, scores = leaves
        obj = super()._tree_unflatten(aux, tuple(base))
        obj._scores = scores
        return obj

    def _with_array(self, array, names=None):
        obj = super()._with_array(array, names=names)
        obj._scores = self._scores
        return obj

    def __getitem__(self, idx):
        out = super().__getitem__(idx)
        if self._scores is not None:
            if isinstance(idx, (np.ndarray,)) and idx.dtype == bool:
                out._scores = self._scores[idx]
            else:
                out._scores = self._scores[idx]
        return out

    # labels are invariant under every geometric op
    def _hflip(self, **kw): return self.clone()
    def _vflip(self, **kw): return self.clone()
    def _resize(self, size01, **kw): return self.clone()
    def _rotate(self, angle, center=None, **kw): return self.clone()
    def _crop(self, H_crop, W_crop, **kw): return self.clone()
    def _pad(self, oy, ox, **kw): return self.clone()
    def _spatial_shift(self, sy, sx, **kw): return self.clone()
