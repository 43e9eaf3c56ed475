"""CrowdHuman person detection (reference: alodataset/crowd_human_dataset.py:19).

Layout: <dir>/Images/*.jpg + annotation_{train,val}.odgt (one JSON per line:
{"ID", "gtboxes": [{"tag", "fbox"|"vbox"|"hbox": [x, y, w, h], ...}]}).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from ..aloscene import BoundingBoxes2D, Frame, Labels
from .base_dataset import BaseDataset, Split
from .mixins import SplitMixin


class CrowdHumanDataset(SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "CrowdHuman_train",
                     Split.VAL: "CrowdHuman_val"}
    CLASSES = ("person",)

    def __init__(self, split: Split = Split.TRAIN, box_key: str = "fbox",
                 sample: bool = False, **kwargs):
        self.split = split
        self.box_key = box_key
        super().__init__(name="CrowdHuman", sample=sample, **kwargs)
        if sample:
            self.items = list(range(6))
            return
        folder = os.path.join(self.dataset_dir, self.get_split_folder())
        self.img_folder = os.path.join(folder, "Images")
        ann_name = "annotation_train.odgt" if split == Split.TRAIN \
            else "annotation_val.odgt"
        ann_file = os.path.join(self.dataset_dir, ann_name)
        self.items = []
        with open(ann_file) as f:
            for line in f:
                rec = json.loads(line)
                boxes = [g[self.box_key] for g in rec.get("gtboxes", [])
                         if g.get("tag") == "person" and self.box_key in g]
                self.items.append({"ID": rec["ID"], "boxes": boxes})

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(6000 + idx)
        frame = Frame(rng.uniform(0, 255, (3, 120, 160)).astype(np.float32))
        n = rng.randint(1, 6)
        boxes = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.3, 0.7, n),
                          rng.uniform(0.05, 0.15, n),
                          rng.uniform(0.2, 0.4, n)], -1).astype(np.float32)
        frame.append_boxes2d(BoundingBoxes2D(
            boxes, "xcyc", False,
            labels=Labels(np.zeros(n, np.float32), labels_names=self.CLASSES)))
        return frame

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        rec = self.items[idx]
        frame = Frame(os.path.join(self.img_folder, rec["ID"] + ".jpg"))
        H, W = frame.HW
        boxes = []
        for x, y, w, h in rec["boxes"]:
            if w <= 0 or h <= 0:
                continue
            boxes.append([(x + w / 2) / W, (y + h / 2) / H, w / W, h / H])
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes, np.float32).reshape(-1, 4), "xcyc", False,
            labels=Labels(np.zeros(len(boxes), np.float32),
                          labels_names=self.CLASSES)))
        return frame
