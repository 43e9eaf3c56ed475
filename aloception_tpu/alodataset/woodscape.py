"""WoodScape fisheye dataset (reference: alodataset/woodScape_dataset.py +
woodScape_split_dataset.py).

Layout: rgb_images/*.png, box_2d_annotations/*.txt (class, x1, y1, x2, y2),
instance_annotations/*.json, semantic_annotations/gtLabels/*.png.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

import numpy as np

from ..aloscene import BoundingBoxes2D, Frame, Labels, Mask
from .base_dataset import BaseDataset, Split
from .mixins import SplitMixin


class WooDScapeDataset(BaseDataset):

    CLASSES = ("vehicles", "person", "bicycle", "traffic_light",
               "traffic_sign")

    def __init__(self, labels: Optional[List[str]] = ("boxes_2d",),
                 cameras: Optional[List[str]] = None, fragment: float = 1.0,
                 sample: bool = False, **kwargs):
        self.labels = list(labels or [])
        self.cameras = cameras
        super().__init__(name="woodscape", sample=sample, **kwargs)
        if sample:
            self.items = list(range(4))
            return
        imgs = sorted(glob.glob(os.path.join(self.dataset_dir, "rgb_images",
                                             "*.png")))
        if cameras:
            imgs = [p for p in imgs
                    if any(c in os.path.basename(p) for c in cameras)]
        self.items = imgs[:int(len(imgs) * fragment)]

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(7000 + idx)
        frame = Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32))
        frame.append_boxes2d(BoundingBoxes2D(
            np.array([[0.4, 0.5, 0.2, 0.25]], np.float32), "xcyc", False,
            labels=Labels(np.array([0.0], np.float32),
                          labels_names=self.CLASSES)))
        return frame

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        path = self.items[idx]
        frame = Frame(path)
        H, W = frame.HW
        stem = os.path.splitext(os.path.basename(path))[0]
        if "boxes_2d" in self.labels:
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
        if "segmentation" in self.labels:
            import cv2
            seg_path = os.path.join(self.dataset_dir, "semantic_annotations",
                                    "gtLabels", stem + ".png")
            if os.path.exists(seg_path):
                sem = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
                ids = [i for i in np.unique(sem) if i > 0]
                if ids:
                    masks = np.stack([(sem == i).astype(np.float32)
                                      for i in ids])
                    frame.append_segmentation(Mask(
                        masks, labels=Labels(np.asarray(ids, np.float32))))
        return frame


class WooDScapeSplitDataset(WooDScapeDataset):
    """Deterministic train/val split by fragment of the sorted file list
    (woodScape_split_dataset.py:4): train = first 90%, val = last 10%."""

    SPLIT_FRAGMENTS = {Split.TRAIN: 0.9, Split.VAL: -0.1}

    def __init__(self, split: Split = Split.TRAIN, **kwargs):
        self.split = split
        frag = self.SPLIT_FRAGMENTS[split]
        super().__init__(fragment=abs(frag), **kwargs)
        if not self.sample and frag < 0:
            # negative fragment = take from the END of the list
            all_items = sorted(set(self.items))
            k = max(int(len(all_items) / 0.9 * 0.1), 1) if all_items else 0
            self.items = all_items[-k:]
