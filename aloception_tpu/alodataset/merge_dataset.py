"""MergeDataset: concatenate datasets with sampling weights
(reference: alodataset/merge_dataset.py:7)."""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from .base_dataset import BaseDataset


class MergeDataset(BaseDataset):
    """Concat N datasets; optional per-dataset integer weights repeat their
    indices (merge_dataset.py:28-64); a shared or per-dataset transform can
    be applied."""

    def __init__(self, datasets: List[BaseDataset],
                 weights: Optional[List[int]] = None,
                 transform_fn: Optional[Callable] = None, **kwargs):
        super(BaseDataset, self).__init__()  # skip dir resolution
        self.name = "merge"
        self.sample = any(getattr(d, "sample", False) for d in datasets)
        self.transform_fn = transform_fn
        self.max_retry_on_error = 3
        self.retry_offset = 17
        self.datasets = datasets
        weights = weights if weights is not None else [1] * len(datasets)
        assert len(weights) == len(datasets)
        self.items = []
        for d_idx, (d, w) in enumerate(zip(datasets, weights)):
            for _ in range(w):
                self.items.extend((d_idx, i) for i in range(len(d)))

    def getitem(self, idx: int):
        d_idx, i = self.items[idx]
        dataset = self.datasets[d_idx]
        data = dataset.getitem(i)
        if dataset.transform_fn is not None:
            data = dataset.transform_fn(data)
        return data
