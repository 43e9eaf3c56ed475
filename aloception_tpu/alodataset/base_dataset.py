"""BaseDataset: streaming datasets that emit aloscene Frames.

Re-design of /root/reference/alodataset/base_dataset.py:117: dataset-dir
resolution through a user config JSON, error-tolerant getitem with
retry-offset, a ``transform_fn`` hook, and two loaders:

- ``stream_loader``  — batchless iterator of single samples (base_dataset.py:324)
- ``train_loader``   — shuffled, multi-worker, identity-collate (list of
  Frames; the device batch happens later via aloscene.batch_list, exactly the
  reference's two-stage batching, base_dataset.py:342)

Workers here are threads (cv2/np release the GIL for decode) with a bounded
prefetch queue — the torch DataLoader process-pool analog without the
pickling machinery the reference needs (its named-tensor rename hack,
augmented_tensor.py:681, is unnecessary: our arrays are plain numpy).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from enum import Enum
from typing import Any, Callable, Iterator, List, Optional

import numpy as np

from ..aloscene import InvalidSampleError

CONFIG_PATH = os.path.expanduser("~/.aloception_tpu/alodataset_config.json")


class Split(Enum):
    """(base_dataset.py:29)"""
    TRAIN = "train"
    VAL = "val"
    TEST = "test"

    @classmethod
    def list(cls):
        return [s for s in cls]


def load_dataset_config() -> dict:
    if os.path.exists(CONFIG_PATH):
        with open(CONFIG_PATH) as f:
            return json.load(f)
    return {}


def save_dataset_config(cfg: dict):
    os.makedirs(os.path.dirname(CONFIG_PATH), exist_ok=True)
    with open(CONFIG_PATH, "w") as f:
        json.dump(cfg, f, indent=2)


class BaseDataset:
    """Subclasses set ``self.items`` (indexable) and implement ``getitem``."""

    def __init__(self, name: str, dataset_dir: Optional[str] = None,
                 transform_fn: Optional[Callable] = None, sample: bool = False,
                 max_retry_on_error: int = 3, retry_offset: int = 17,
                 **kwargs):
        self.name = name
        self.sample = sample
        self.transform_fn = transform_fn
        self.max_retry_on_error = max_retry_on_error
        self.retry_offset = retry_offset
        self.items: List[Any] = []
        if not sample:
            self.dataset_dir = self.get_dataset_dir(dataset_dir)
        else:
            self.dataset_dir = None

    # ------------------------------------------------------------------
    # dataset dir resolution (base_dataset.py:235-307)
    # ------------------------------------------------------------------
    def get_dataset_dir(self, dataset_dir: Optional[str] = None) -> str:
        cfg = load_dataset_config()
        if dataset_dir is not None:
            dataset_dir = os.path.expanduser(dataset_dir)
            if cfg.get(self.name) != dataset_dir:
                cfg[self.name] = dataset_dir
                save_dataset_config(cfg)
            return dataset_dir
        if self.name in cfg:
            return cfg[self.name]
        if os.isatty(0):  # interactive prompt (base_dataset.py:111)
            path = input(f"Path to the '{self.name}' dataset directory: ").strip()
            path = os.path.expanduser(path)
            cfg[self.name] = path
            save_dataset_config(cfg)
            return path
        raise FileNotFoundError(
            f"dataset dir for '{self.name}' not configured; add it to "
            f"{CONFIG_PATH} or pass dataset_dir=")

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.items)

    def getitem(self, idx: int):
        raise NotImplementedError

    def __getitem__(self, idx: int):
        """Error-tolerant getitem with retry-offset (base_dataset.py:187-205)."""
        total = len(self)
        for attempt in range(self.max_retry_on_error + 1):
            try:
                data = self.getitem(idx)
                break
            except InvalidSampleError as e:
                if attempt == self.max_retry_on_error:
                    raise
                idx = (idx + self.retry_offset) % max(total, 1)
        if self.transform_fn is not None:
            data = self.transform_fn(data)
        return data

    # ------------------------------------------------------------------
    # loaders (base_dataset.py:324-372)
    # ------------------------------------------------------------------
    def stream_loader(self, num_workers: int = 2) -> Iterator:
        """Ordered single-sample stream."""
        return _PrefetchIterator(self, range(len(self)), num_workers,
                                 batch_size=None)

    def train_loader(self, batch_size: int = 1, num_workers: int = 2,
                     shuffle: bool = True, seed: Optional[int] = None,
                     drop_last: bool = True) -> "_LoaderFactory":
        """Shuffled epoch loader; collate = list of samples (batch on device
        later via aloscene.batch_list)."""
        return _LoaderFactory(self, batch_size, num_workers, shuffle, seed,
                              drop_last)


class _LoaderFactory:
    """Re-iterable loader (fresh shuffle each epoch)."""

    def __init__(self, dataset, batch_size, num_workers, shuffle, seed, drop_last):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(
                None if self.seed is None else self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        return _PrefetchIterator(self.dataset, order, self.num_workers,
                                 batch_size=self.batch_size,
                                 drop_last=self.drop_last)


class _PrefetchIterator:
    """Bounded thread-pool prefetcher preserving sample order."""

    def __init__(self, dataset, order, num_workers: int, batch_size=None,
                 drop_last: bool = True, prefetch: int = 8):
        self.dataset = dataset
        self.order = list(order)
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 0)
        self.prefetch = prefetch
        self._results: dict = {}
        self._next_submit = 0
        self._next_yield = 0
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._threads: List[threading.Thread] = []
        if self.num_workers:
            for _ in range(self.num_workers):
                t = threading.Thread(target=self._worker, daemon=True)
                t.start()
                self._threads.append(t)

    def _worker(self):
        while True:
            with self._cv:
                while (self._next_submit >= len(self.order)
                       or len(self._results) >= self.prefetch + self.num_workers):
                    if self._next_submit >= len(self.order):
                        return
                    self._cv.wait(timeout=0.1)
                i = self._next_submit
                self._next_submit += 1
            try:
                res = self.dataset[self.order[i]]
            except Exception as e:  # propagate to consumer
                res = e
            with self._cv:
                self._results[i] = res
                self._cv.notify_all()

    def _get(self, i):
        if not self.num_workers:
            return self.dataset[self.order[i]]
        with self._cv:
            while i not in self._results:
                self._cv.wait(timeout=0.1)
            res = self._results.pop(i)
            self._cv.notify_all()
        if isinstance(res, Exception):
            raise res
        return res

    def __iter__(self):
        return self

    def __next__(self):
        n = len(self.order)
        if self.batch_size is None:
            if self._next_yield >= n:
                raise StopIteration
            item = self._get(self._next_yield)
            self._next_yield += 1
            return item
        start = self._next_yield
        if start >= n or (self.drop_last and start + self.batch_size > n):
            raise StopIteration
        stop = min(start + self.batch_size, n)
        batch = [self._get(i) for i in range(start, stop)]
        self._next_yield = stop
        return batch
