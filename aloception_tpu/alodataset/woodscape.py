"""WoodScape fisheye dataset (reference: alodataset/woodScape_dataset.py +
woodScape_split_dataset.py).

Layout: rgb_images/*.png, box_2d_annotations/*.txt (class, x1, y1, x2, y2),
instance_annotations/*.json, semantic_annotations/gtLabels/*.png.

Faithful to the reference knobs (woodScape_dataset.py:64-114): ``cameras``
filters by view (RV/FV/MVL/MVR in the filename), ``fragment`` restricts the
item list — float in [-1, 1] as a fraction or int as a count, negative
meaning "take from the END" — and segmentation supports ``seg_classes``
selection with optional ``merge_classes`` into one renamed channel
(mask_2d_idx_to_3d_onehot_mask, :173-200).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence

import numpy as np

from ..aloscene import BoundingBoxes2D, Frame, Labels, Mask
from .base_dataset import BaseDataset, Split


class WooDScapeDataset(BaseDataset):

    CLASSES = ("vehicles", "person", "bicycle", "traffic_light",
               "traffic_sign")
    CAMERAS = ("RV", "FV", "MVL", "MVR")
    LABELS = ("seg", "boxes_2d")
    SEG_CLASSES = ("void", "road", "lanemarks", "curb", "person", "rider",
                   "vehicles", "bicycle", "motorcycle", "traffic_sign")

    def __init__(self, labels: Optional[Sequence[str]] = ("boxes_2d",),
                 cameras: Optional[Sequence[str]] = None, fragment=1.0,
                 seg_classes: Optional[Sequence[str]] = None,
                 merge_classes: bool = False, rename_merged: str = "mix",
                 sample: bool = False, **kwargs):
        self.labels = list(labels or [])
        self.cameras = list(cameras) if cameras else list(self.CAMERAS)
        self.seg_classes = list(seg_classes) if seg_classes \
            else list(self.SEG_CLASSES)
        assert all(c in self.SEG_CLASSES for c in self.seg_classes), \
            f"invalid seg classes; supported: {self.SEG_CLASSES}"
        assert all(c in self.CAMERAS for c in self.cameras), \
            f"invalid cameras; supported: {self.CAMERAS}"
        self.merge_classes = merge_classes
        self.seg_classes_renamed = [rename_merged] if merge_classes \
            else self.seg_classes
        super().__init__(name="woodscape", sample=sample, **kwargs)
        if sample:
            self.items = list(range(4))
            return
        imgs = sorted(glob.glob(os.path.join(self.dataset_dir, "rgb_images",
                                             "*.png")))
        imgs = [p for p in imgs
                if any(c in os.path.basename(p) for c in self.cameras)]
        # fragment: int = count, float = fraction; sign picks head/tail
        # (woodScape_dataset.py:107-114)
        if isinstance(fragment, float):
            assert -1.0 <= fragment <= 1.0, "float fragment must be in [-1, 1]"
            k = int(abs(fragment) * len(imgs))
        else:
            k = min(abs(int(fragment)), len(imgs))
        self.items = imgs[:k] if fragment >= 0 else imgs[len(imgs) - k:]

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(7000 + idx)
        frame = Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32))
        frame.append_boxes2d(BoundingBoxes2D(
            np.array([[0.4, 0.5, 0.2, 0.25]], np.float32), "xcyc", False,
            labels=Labels(np.array([0.0], np.float32),
                          labels_names=self.CLASSES)))
        return frame

    def _seg_mask(self, stem: str) -> Optional[Mask]:
        """Index-encoded gtLabels PNG -> per-class one-hot Mask over the
        selected seg_classes, optionally merged into one channel
        (mask_2d_idx_to_3d_onehot_mask)."""
        import cv2
        seg_path = os.path.join(self.dataset_dir, "semantic_annotations",
                                "gtLabels", stem + ".png")
        if not os.path.exists(seg_path):
            return None
        sem = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
        planes = [(sem == self.SEG_CLASSES.index(name)).astype(np.float32)
                  for name in self.seg_classes]
        if self.merge_classes:
            planes = [np.clip(np.sum(planes, axis=0), 0, 1)]
        masks = np.stack(planes)
        return Mask(masks, labels=Labels(
            np.arange(len(planes), dtype=np.float32),
            labels_names=tuple(self.seg_classes_renamed)))

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        path = self.items[idx]
        frame = Frame(path)
        H, W = frame.HW
        stem = os.path.splitext(os.path.basename(path))[0]
        if "boxes_2d" in self.labels or "box_2d" in self.labels:
            ann = os.path.join(self.dataset_dir, "box_2d_annotations",
                               stem + ".txt")
            boxes, labs = [], []
            if os.path.exists(ann):
                with open(ann) as f:
                    for line in f:
                        p = line.strip().split(",")
                        if len(p) < 6:
                            p = line.split()
                        name = p[0]
                        x1, y1, x2, y2 = map(float, p[-4:])
                        if name in self.CLASSES:
                            boxes.append([(x1 + x2) / 2 / W, (y1 + y2) / 2 / H,
                                          (x2 - x1) / W, (y2 - y1) / H])
                            labs.append(self.CLASSES.index(name))
            frame.append_boxes2d(BoundingBoxes2D(
                np.asarray(boxes, np.float32).reshape(-1, 4), "xcyc", False,
                labels=Labels(np.asarray(labs, np.float32),
                              labels_names=self.CLASSES)))
        if "segmentation" in self.labels or "seg" in self.labels:
            seg = self._seg_mask(stem)
            if seg is not None:
                frame.append_segmentation(seg)
        return frame


class WooDScapeSplitDataset(WooDScapeDataset):
    """Deterministic train/val split by fragment of the sorted file list
    (woodScape_split_dataset.py:4): train = first 90%, val = last 10% —
    expressed exactly as the reference does, with a signed fragment."""

    SPLIT_FRAGMENTS = {Split.TRAIN: 0.9, Split.VAL: -0.1}

    def __init__(self, split: Split = Split.TRAIN, **kwargs):
        self.split = split
        super().__init__(fragment=self.SPLIT_FRAGMENTS[split], **kwargs)
