"""FlyingThings3D-subset + ChairsSDHom optical-flow datasets
(reference: alodataset/flyingthings3D_subset_dataset.py:1 (375 LoC),
chairssdhom_dataset.py).

FlyingThings3D subset layout: <split>/{image_clean/left, flow/left/into_future,
flow_occlusions/left/into_future, disparity/left, ...}.
ChairsSDHom layout: data/<split>/{t0, t1, flow}.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from ..aloscene import Disparity, Flow, Frame, Mask
from ..aloscene.spatial import _cat_batched
from .base_dataset import BaseDataset, Split
from .mixins import SplitMixin


def _synthetic_pair(seed: int, H: int = 96, W: int = 128):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 255, (3, H + 8, W + 8)).astype(np.float32)
    dx, dy = rng.randint(-4, 5), rng.randint(-4, 5)
    f0 = Frame(base[:, 4:4 + H, 4:4 + W].copy())
    f1 = Frame(base[:, 4 + dy:4 + dy + H, 4 + dx:4 + dx + W].copy())
    flow = np.zeros((2, H, W), np.float32)
    flow[0], flow[1] = dx, dy
    f0.append_flow(Flow(flow, occlusion=Mask(np.zeros((1, H, W), np.float32))),
                   "flow_forward")
    return _cat_batched([f0.temporal(), f1.temporal()], axis_name="T")


class FlyingThings3DSubsetDataset(SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "train", Split.VAL: "val"}

    def __init__(self, split: Split = Split.TRAIN, cameras: List[str] = ("left",),
                 labels: List[str] = ("flow",), backward: bool = False,
                 sample: bool = False, **kwargs):
        self.split = split
        self.cameras = list(cameras)
        self.labels = list(labels)
        self.backward = backward
        super().__init__(name="FlyingThings3DSubset", sample=sample, **kwargs)
        if sample:
            self.items = list(range(6))
            return
        base = os.path.join(self.dataset_dir, self.get_split_folder())
        imgs = sorted(glob.glob(os.path.join(base, "image_clean", "left",
                                             "*.png")))
        self.base = base
        self.items = []
        for i in range(len(imgs) - 1):
            i0 = int(os.path.splitext(os.path.basename(imgs[i]))[0])
            i1 = int(os.path.splitext(os.path.basename(imgs[i + 1]))[0])
            if i1 == i0 + 1:
                self.items.append((imgs[i], imgs[i + 1], i0))

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return _synthetic_pair(8000 + idx)
        p0, p1, i0 = self.items[idx]
        f0, f1 = Frame(p0), Frame(p1)
        flow_path = os.path.join(self.base, "flow", "left", "into_future",
                                 f"{i0:07d}.flo")
        if "flow" in self.labels and os.path.exists(flow_path):
            occ_path = os.path.join(self.base, "flow_occlusions", "left",
                                    "into_future", f"{i0:07d}.png")
            occ = Mask(occ_path) if os.path.exists(occ_path) else None
            f0.append_flow(Flow(flow_path, occlusion=occ), "flow_forward")
        if "disparity" in self.labels:
            disp_path = os.path.join(self.base, "disparity", "left",
                                     f"{i0:07d}.pfm")
            if os.path.exists(disp_path):
                f0.append_disparity(Disparity(disp_path, png_negate=False,
                                              camera_side="left"))
        return _cat_batched([f0.temporal(), f1.temporal()], axis_name="T")


class ChairsSDHomDataset(SplitMixin, BaseDataset):
    """(chairssdhom_dataset.py) small-displacement chairs: data/<split>/
    {t0, t1, flow}/*.{png,pfm,flo}."""

    SPLIT_FOLDERS = {Split.TRAIN: "train", Split.VAL: "test"}

    def __init__(self, split: Split = Split.TRAIN, sample: bool = False,
                 **kwargs):
        self.split = split
        super().__init__(name="ChairsSDHom", sample=sample, **kwargs)
        if sample:
            self.items = list(range(6))
            return
        base = os.path.join(self.dataset_dir, "data", self.get_split_folder())
        self.base = base
        t0 = sorted(glob.glob(os.path.join(base, "t0", "*.png")))
        self.items = [os.path.splitext(os.path.basename(p))[0] for p in t0]

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return _synthetic_pair(9000 + idx)
        stem = self.items[idx]
        f0 = Frame(os.path.join(self.base, "t0", stem + ".png"))
        f1 = Frame(os.path.join(self.base, "t1", stem + ".png"))
        for ext in (".flo", ".pfm"):
            flow_path = os.path.join(self.base, "flow", stem + ext)
            if os.path.exists(flow_path):
                if ext == ".pfm":
                    from ..aloscene.io.disparity import load_pfm
                    arr = load_pfm(flow_path)[:2]
                    f0.append_flow(Flow(arr), "flow_forward")
                else:
                    f0.append_flow(Flow(flow_path), "flow_forward")
                break
        return _cat_batched([f0.temporal(), f1.temporal()], axis_name="T")
