"""FlyingChairs2: synthetic optical-flow pairs
(reference: alodataset/flying_chairs2_dataset.py)."""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..aloscene import Flow, Frame, Mask
from ..aloscene.spatial import _cat_batched
from .base_dataset import BaseDataset, Split
from .mixins import SplitMixin


def _temporal_pair(frame_0: Frame, frame_1: Frame) -> Frame:
    """Stack two frames along T; flow stays attached to t=0 as a per-step
    list [flow, None] (the reference's torch.cat semantics)."""
    return _cat_batched([frame_0.temporal(), frame_1.temporal()], axis_name="T")


class FlyingChairs2Dataset(SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.VAL: "val", Split.TRAIN: "train"}

    def __init__(self, split: Split = Split.TRAIN, sample: bool = False, **kwargs):
        self.split = split
        super().__init__(name="FlyingChairs2", sample=sample, **kwargs)
        if sample:
            self.items = list(range(8))
            return
        self.dir_path = os.path.join(self.dataset_dir, self.get_split_folder())
        file_ids = sorted(f.split("-")[0] for f in os.listdir(self.dir_path)
                          if "flow_01.flo" in f)
        self.items = [{
            "image_0": os.path.join(self.dir_path, f"{fid}-img_0.png"),
            "image_1": os.path.join(self.dir_path, f"{fid}-img_1.png"),
            "flow": os.path.join(self.dir_path, f"{fid}-flow_01.flo"),
            "flow_occ": os.path.join(self.dir_path, f"{fid}-occ_01.png"),
        } for fid in file_ids]

    def _getitem_sample(self, idx: int) -> Frame:
        """Synthetic fixture: a textured image translated by a known flow."""
        rng = np.random.RandomState(2000 + idx)
        H, W = 96, 128
        img0 = rng.uniform(0, 255, (3, H + 16, W + 16)).astype(np.float32)
        dx, dy = rng.randint(-6, 7), rng.randint(-6, 7)
        i0 = img0[:, 8:8 + H, 8:8 + W]
        i1 = img0[:, 8 + dy:8 + dy + H, 8 + dx:8 + dx + W]
        flow = np.zeros((2, H, W), np.float32)
        flow[0], flow[1] = dx, dy
        frame_0 = Frame(i0.copy(), normalization="255")
        frame_1 = Frame(i1.copy(), normalization="255")
        occ = Mask(np.zeros((1, H, W), np.float32))
        frame_0.append_flow(Flow(flow, occlusion=occ), "flow_forward")
        return _temporal_pair(frame_0, frame_1)

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        seq = self.items[idx]
        frame_0 = Frame(seq["image_0"])
        frame_1 = Frame(seq["image_1"])
        occ = Mask(seq["flow_occ"])
        frame_0.append_flow(Flow(seq["flow"], occlusion=occ), "flow_forward")
        return _temporal_pair(frame_0, frame_1)
