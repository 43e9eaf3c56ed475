"""MPI-Sintel datasets (reference: alodataset/sintel_*_dataset.py).

Directory layout (training/): ``<pass>/<scene>/frame_%04d.png`` images,
``flow/<scene>/frame_%04d.flo`` forward flow, ``occlusions/<scene>/``
occlusion PNGs, ``disparities/<scene>/`` for the stereo variant.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from ..aloscene import Disparity, Flow, Frame, Mask
from ..aloscene.spatial import _cat_batched
from .base_dataset import BaseDataset, Split
from .mixins import SequenceMixin, SplitMixin


class SintelBaseDataset(SequenceMixin, SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "training", Split.VAL: "training",
                     Split.TEST: "test"}
    PASSES = ("clean", "final")

    def __init__(self, split: Split = Split.TRAIN, cameras: List[str] = ("left",),
                 passes: List[str] = ("clean",), sample: bool = False, **kwargs):
        self.split = split
        self.cameras = list(cameras)
        self.passes = list(passes)
        super().__init__(name="Sintel", sample=sample, **kwargs)
        if sample:
            self.items = list(range(6))
            return
        self.base = os.path.join(self.dataset_dir, self.get_split_folder())
        self.items = self._index_sequences()

    def _index_sequences(self):
        items = []
        render = self.passes[0]
        scenes = sorted(os.listdir(os.path.join(self.base, render)))
        for scene in scenes:
            frames = sorted(glob.glob(
                os.path.join(self.base, render, scene, "frame_*.png")))
            step = self.sequence_skip + 1
            span = (self.sequence_size - 1) * step
            for i in range(0, len(frames) - span):
                items.append((scene, [os.path.basename(frames[i + k * step])
                                      for k in range(self.sequence_size)]))
        return items

    # hooks for subclasses -------------------------------------------------
    def _attach_labels(self, frame: Frame, scene: str, fname: str, t: int,
                       is_last: bool):
        pass

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(3000 + idx)
        H, W = 96, 128
        frames = []
        base = rng.uniform(0, 255, (3, H + 8, W + 8)).astype(np.float32)
        for t in range(self.sequence_size):
            f = Frame(base[:, t:t + H, t:t + W].copy(), normalization="255")
            if t < self.sequence_size - 1:
                flow = np.ones((2, H, W), np.float32)
                f.append_flow(Flow(flow, occlusion=Mask(
                    np.zeros((1, H, W), np.float32))), "flow_forward")
            frames.append(f.temporal())
        return _cat_batched(frames, axis_name="T")

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        scene, fnames = self.items[idx]
        render = self.passes[0]
        frames = []
        for t, fname in enumerate(fnames):
            f = Frame(os.path.join(self.base, render, scene, fname))
            self._attach_labels(f, scene, fname, t, t == len(fnames) - 1)
            frames.append(f.temporal())
        return _cat_batched(frames, axis_name="T")


class SintelFlowDataset(SintelBaseDataset):
    """Optical-flow variant (sintel_flow_dataset.py)."""

    def _attach_labels(self, frame, scene, fname, t, is_last):
        if is_last:
            return
        stem = os.path.splitext(fname)[0]
        flow_path = os.path.join(self.base, "flow", scene, stem + ".flo")
        if not os.path.exists(flow_path):
            return
        occ_path = os.path.join(self.base, "occlusions", scene, fname)
        occ = Mask(occ_path) if os.path.exists(occ_path) else None
        frame.append_flow(Flow(flow_path, occlusion=occ), "flow_forward")


class SintelDisparityDataset(SintelBaseDataset):
    """Stereo-disparity variant (sintel_disparity_dataset.py)."""

    def _attach_labels(self, frame, scene, fname, t, is_last):
        disp_path = os.path.join(self.base, "disparities", scene, fname)
        if not os.path.exists(disp_path):
            return
        import cv2
        img = cv2.imread(disp_path)
        if img is None:
            return
        # Sintel disparity encoding: d = R*4 + G/64 + B/16384 (BGR read)
        b, g, r = img[..., 0].astype(np.float32), img[..., 1].astype(np.float32), \
            img[..., 2].astype(np.float32)
        disp = r * 4 + g / 64 + b / 16384
        occ_path = os.path.join(self.base, "occlusions", scene, fname)
        occ = Mask(occ_path) if os.path.exists(occ_path) else None
        frame.append_disparity(Disparity(disp[None], occlusion=occ,
                                         disp_format="unsigned"))


class SintelMultiDataset(SintelFlowDataset, SintelDisparityDataset):
    """Flow + disparity combined (sintel_multi_dataset.py)."""

    def _attach_labels(self, frame, scene, fname, t, is_last):
        SintelFlowDataset._attach_labels(self, frame, scene, fname, t, is_last)
        SintelDisparityDataset._attach_labels(self, frame, scene, fname, t, is_last)
