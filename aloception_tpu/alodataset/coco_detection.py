"""COCO detection datasets.

Re-design of /root/reference/alodataset/coco_base_dataset.py:20 (CocoBaseDataset)
and coco_detection_dataset.py:17 — without the pycocotools dependency: the
annotation JSON is indexed directly (images, per-image annotation lists,
category remapping) and polygon/RLE segmentations rasterize through cv2.

``sample=True`` diverges from the reference (which downloads pickled GCS
shards, base_dataset.py:376): offline synthetic fixtures are generated
deterministically instead, keeping tests and smoke-training hermetic.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..aloscene import (BoundingBoxes2D, Frame, Labels, Mask)
from ..aloscene.io.image import load_image
from .base_dataset import BaseDataset, Split
from .mixins import SplitMixin


def _poly_to_mask(segmentation, h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygon(s) / uncompressed RLE to a float (h, w) mask
    (the ConvertCocoPolysToMask analog, coco_base_dataset.py:260)."""
    import cv2
    mask = np.zeros((h, w), np.uint8)
    if isinstance(segmentation, dict):  # uncompressed RLE
        counts, size = segmentation["counts"], segmentation["size"]
        flat = np.zeros(size[0] * size[1], np.uint8)
        pos, val = 0, 0
        for c in counts:
            flat[pos:pos + c] = val
            pos += c
            val = 1 - val
        return flat.reshape(size[1], size[0]).T.astype(np.float32)
    for poly in segmentation:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask.astype(np.float32)


class CocoBaseDataset(BaseDataset):
    """(coco_base_dataset.py:20)

    getitem -> Frame with boxes2d (xcyc relative + Labels carrying
    labels_names) and optionally per-object segmentation Masks.
    """

    SAMPLE_CLASSES = ("person", "car", "dog", "chair")

    def __init__(self, img_folder: str = None, ann_file: str = None,
                 name: str = "coco", return_masks: bool = False,
                 classes: Optional[List[str]] = None, sample: bool = False,
                 fixed_ratio: Optional[float] = None, **kwargs):
        super().__init__(name=name, sample=sample, **kwargs)
        self.return_masks = return_masks
        self.classes = classes
        if sample:
            self.items = list(range(12))
            self.labels_names = list(self.SAMPLE_CLASSES)
            return
        assert img_folder is not None and ann_file is not None
        self.img_folder = os.path.join(self.dataset_dir, img_folder)
        ann_path = os.path.join(self.dataset_dir, ann_file)
        with open(ann_path) as f:
            coco = json.load(f)

        cats = {c["id"]: c["name"] for c in coco.get("categories", [])}
        max_cat = max(cats) if cats else 0
        # identity-style mapping: labels_names indexed by category id
        # (coco_base_dataset.py:139-172 class filtering)
        self.labels_names = ["N/A"] * (max_cat + 1)
        for cid, cname in cats.items():
            self.labels_names[cid] = cname
        self._cat_remap = None
        if classes is not None:
            missing = [c for c in classes if c not in cats.values()]
            if missing:
                raise ValueError(f"unknown classes: {missing}")
            self._cat_remap = {cid: classes.index(cname)
                               for cid, cname in cats.items() if cname in classes}
            self.labels_names = list(classes)

        anns_by_img: Dict[int, List[dict]] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            if self._cat_remap is not None and a["category_id"] not in self._cat_remap:
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.imgs = {i["id"]: i for i in coco["images"]}
        img_ids = sorted(self.imgs)
        if classes is not None:
            img_ids = [i for i in img_ids if anns_by_img.get(i)]
        self.items = img_ids
        self.anns_by_img = anns_by_img

    # ------------------------------------------------------------------
    def _getitem_sample(self, idx: int) -> Frame:
        """Deterministic synthetic fixture: colored rectangles as objects."""
        rng = np.random.RandomState(1000 + idx)
        H, W = rng.randint(180, 260), rng.randint(240, 340)
        img = rng.uniform(0, 80, (3, H, W)).astype(np.float32)
        n = rng.randint(1, 5)
        boxes, labels, masks = [], [], []
        for _ in range(n):
            w, h = rng.uniform(0.1, 0.4), rng.uniform(0.1, 0.4)
            xc = rng.uniform(w / 2, 1 - w / 2)
            yc = rng.uniform(h / 2, 1 - h / 2)
            cls = rng.randint(0, len(self.SAMPLE_CLASSES))
            x0, x1 = int((xc - w / 2) * W), int((xc + w / 2) * W)
            y0, y1 = int((yc - h / 2) * H), int((yc + h / 2) * H)
            img[:, y0:y1, x0:x1] = rng.uniform(100, 255, (3, 1, 1))
            boxes.append([xc, yc, w, h])
            labels.append(cls)
            if self.return_masks:
                m = np.zeros((1, H, W), np.float32)
                m[0, y0:y1, x0:x1] = 1.0
                masks.append(m)
        frame = Frame(img, normalization="255")
        lab = Labels(np.asarray(labels, np.float32),
                     labels_names=self.labels_names)
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes, np.float32), boxes_format="xcyc", absolute=False,
            labels=lab))
        if self.return_masks:
            frame.append_segmentation(Mask(
                np.concatenate(masks, 0) if masks else np.zeros((0, H, W), np.float32),
                labels=lab.clone()))
        return frame

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        img_id = self.items[idx]
        info = self.imgs[img_id]
        frame = Frame(os.path.join(self.img_folder, info["file_name"]))
        H, W = frame.H, frame.W
        anns = self.anns_by_img.get(img_id, [])

        boxes, labels, masks = [], [], []
        for a in anns:
            x, y, w, h = a["bbox"]  # COCO: xywh absolute
            if w <= 0 or h <= 0:
                continue
            boxes.append([(x + w / 2) / W, (y + h / 2) / H, w / W, h / H])
            cid = a["category_id"]
            labels.append(self._cat_remap[cid] if self._cat_remap else cid)
            if self.return_masks and "segmentation" in a:
                masks.append(_poly_to_mask(a["segmentation"], H, W)[None])

        lab = Labels(np.asarray(labels, np.float32),
                     labels_names=self.labels_names)
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes, np.float32).reshape(-1, 4),
            boxes_format="xcyc", absolute=False, labels=lab))
        if self.return_masks:
            seg = np.concatenate(masks, 0) if masks \
                else np.zeros((0, H, W), np.float32)
            frame.append_segmentation(Mask(seg, labels=lab.clone()))
        return frame


class CocoDetectionDataset(SplitMixin, CocoBaseDataset):
    """Split-aware COCO detection (coco_detection_dataset.py:17)."""

    SPLIT_FOLDERS = {Split.TRAIN: "train2017", Split.VAL: "val2017",
                     Split.TEST: "test2017"}
    SPLIT_ANN_FILES = {
        Split.TRAIN: "annotations/instances_train2017.json",
        Split.VAL: "annotations/instances_val2017.json",
        Split.TEST: None,
    }

    def __init__(self, split: Split = Split.TRAIN, name: str = "coco", **kwargs):
        self.split = split
        kwargs.setdefault("img_folder", self.SPLIT_FOLDERS[split])
        kwargs.setdefault("ann_file", self.SPLIT_ANN_FILES[split])
        super().__init__(name=name, **kwargs)
