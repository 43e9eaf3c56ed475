"""LVIS v1 dataset (reference: alodataset/lvis_dataset.py): large-vocabulary
instance segmentation in COCO-style JSON; image paths come from
``coco_url`` suffixes over the COCO image folders."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..aloscene import BoundingBoxes2D, Frame, Labels, Mask
from .base_dataset import BaseDataset, Split
from .coco_detection import _poly_to_mask
from .mixins import SplitMixin


class LvisDataset(SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "train2017", Split.VAL: "val2017"}

    def __init__(self, split: Split = Split.TRAIN, return_masks: bool = False,
                 sample: bool = False, **kwargs):
        self.split = split
        self.return_masks = return_masks
        super().__init__(name="lvis", sample=sample, **kwargs)
        if sample:
            self.items = list(range(6))
            self.labels_names = ["obj_a", "obj_b", "obj_c"]
            return
        tag = "train" if split == Split.TRAIN else "val"
        with open(os.path.join(self.dataset_dir,
                               f"lvis_v1_{tag}.json")) as f:
            lvis = json.load(f)
        cats = {c["id"]: c["name"] for c in lvis["categories"]}
        max_cat = max(cats)
        self.labels_names = ["N/A"] * (max_cat + 1)
        for cid, name in cats.items():
            self.labels_names[cid] = name
        anns_by_img: Dict[int, List[dict]] = {}
        for a in lvis["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.imgs = {i["id"]: i for i in lvis["images"]}
        self.anns_by_img = anns_by_img
        self.items = sorted(self.imgs)

    def _img_path(self, info: dict) -> str:
        # lvis images reference COCO urls: .../{split}2017/xxxx.jpg
        url = info.get("coco_url", "")
        suffix = "/".join(url.split("/")[-2:]) if url else info.get(
            "file_name", "")
        return os.path.join(self.dataset_dir, suffix)

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(1300 + idx)
        frame = Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32))
        frame.append_boxes2d(BoundingBoxes2D(
            np.array([[0.5, 0.5, 0.3, 0.3]], np.float32), "xcyc", False,
            labels=Labels(np.array([1.0], np.float32),
                          labels_names=self.labels_names)))
        return frame

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        img_id = self.items[idx]
        info = self.imgs[img_id]
        frame = Frame(self._img_path(info))
        H, W = frame.HW
        boxes, labels, masks = [], [], []
        for a in self.anns_by_img.get(img_id, []):
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([(x + w / 2) / W, (y + h / 2) / H, w / W, h / H])
            labels.append(a["category_id"])
            if self.return_masks and "segmentation" in a:
                masks.append(_poly_to_mask(a["segmentation"], H, W)[None])
        lab = Labels(np.asarray(labels, np.float32),
                     labels_names=self.labels_names)
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes, np.float32).reshape(-1, 4), "xcyc", False,
            labels=lab))
        if self.return_masks:
            frame.append_segmentation(Mask(
                np.concatenate(masks, 0) if masks
                else np.zeros((0, H, W), np.float32), labels=lab.clone()))
        return frame
