"""MOT17 multi-object tracking (reference: alodataset/mot17.py:15).

Layout: <split>/<sequence>/{seqinfo.ini, img1/%06d.jpg, gt/gt.txt}. gt.txt
rows: frame, track_id, x, y, w, h, conf, class, visibility. getitem returns a
T-dim Frame sequence with per-frame boxes2d carrying track-id Labels.
"""

from __future__ import annotations

import configparser
import os
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from ..aloscene import BoundingBoxes2D, Frame, Labels
from ..aloscene.spatial import _cat_batched
from .base_dataset import BaseDataset, Split
from .mixins import SequenceMixin, SplitMixin


class Mot17(SequenceMixin, SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "train", Split.VAL: "train",
                     Split.TEST: "test"}

    def __init__(self, split: Split = Split.TRAIN, sequence_size: int = 2,
                 detections_set="FRCNN", sample: bool = False,
                 validation_sequences: Optional[List[str]] = None,
                 training_sequences: Optional[List[str]] = None,
                 visibility_threshold: float = 0.0,
                 random_step: Optional[int] = None, **kwargs):
        """Mirrors the reference knobs (mot17.py:51-62): ``detections_set``
        is one of / a list of {DPM, SDP, FRCNN}; ``visibility_threshold``
        drops mostly-occluded boxes; ``random_step`` samples the temporal
        stride of each sequence window in [1, random_step] per epoch item;
        ``training_sequences`` / ``validation_sequences`` filter by MOT17-XX
        name."""
        self.split = split
        if isinstance(detections_set, str):
            detections_set = [detections_set]
        self.detections_set = detections_set
        self.visibility_threshold = visibility_threshold
        self.random_step = random_step
        super().__init__(name="mot17", sample=sample,
                         sequence_size=sequence_size, **kwargs)
        if sample:
            self.items = list(range(4))
            return
        self.mot_folder = os.path.join(self.dataset_dir,
                                       self.get_split_folder())
        self.items = []
        self.seq_len: Dict[str, int] = {}
        self.gt: Dict[str, Dict[int, List]] = {}
        for seq in sorted(os.listdir(self.mot_folder)):
            if not any(d in seq for d in detections_set):
                continue
            if validation_sequences is not None:
                in_val = any(v in seq for v in validation_sequences)
                if (split == Split.VAL) != in_val:
                    continue
            if training_sequences is not None and split == Split.TRAIN \
                    and not any(t in seq for t in training_sequences):
                continue
            info = configparser.ConfigParser()
            info.read(os.path.join(self.mot_folder, seq, "seqinfo.ini"))
            n = int(info["Sequence"]["seqLength"])
            self.seq_len[seq] = n
            gt_path = os.path.join(self.mot_folder, seq, "gt", "gt.txt")
            per_frame = defaultdict(list)
            if os.path.exists(gt_path):
                with open(gt_path) as f:
                    for line in f:
                        p = line.strip().split(",")
                        frame_id, track = int(p[0]), int(p[1])
                        x, y, w, h = map(float, p[2:6])
                        conf = float(p[6])
                        vis = float(p[8]) if len(p) > 8 else 1.0
                        if conf == 0 or vis < self.visibility_threshold:
                            continue
                        per_frame[frame_id].append((track, x, y, w, h))
            self.gt[seq] = per_frame
            step = self.sequence_skip + 1
            span = (self.sequence_size - 1) * step
            for start in range(1, n + 1 - span):
                self.items.append((seq, [start + k * step
                                         for k in range(self.sequence_size)]))

    def _frame_with_gt(self, seq: str, frame_id: int) -> Frame:
        frame = Frame(os.path.join(self.mot_folder, seq, "img1",
                                   f"{frame_id:06d}.jpg"))
        H, W = frame.HW
        dets = self.gt.get(seq, {}).get(frame_id, [])
        boxes, tracks = [], []
        for track, x, y, w, h in dets:
            boxes.append([(x + w / 2) / W, (y + h / 2) / H, w / W, h / H])
            tracks.append(track)
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes, np.float32).reshape(-1, 4), "xcyc", False,
            labels=Labels(np.asarray(tracks, np.float32))))
        return frame

    def _getitem_sample(self, idx: int) -> Frame:
        rng = np.random.RandomState(5000 + idx)
        frames = []
        for t in range(self.sequence_size):
            f = Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32))
            xc = 0.3 + 0.05 * t
            f.append_boxes2d(BoundingBoxes2D(
                np.array([[xc, 0.5, 0.2, 0.3]], np.float32), "xcyc", False,
                labels=Labels(np.array([7.0], np.float32))))
            frames.append(f.temporal())
        return _cat_batched(frames, axis_name="T")

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            return self._getitem_sample(idx)
        seq, frame_ids = self.items[idx]
        if self.random_step is not None and self.sequence_size > 1:
            # re-stride the window with a random temporal step
            # (reference mot17.py random_step)
            step = np.random.randint(1, self.random_step + 1)
            start = frame_ids[0]
            last = self.seq_len.get(seq, frame_ids[-1])
            if start + (self.sequence_size - 1) * step > last:
                step = max(1, (last - start) // max(1, self.sequence_size - 1))
            frame_ids = [start + k * step for k in range(self.sequence_size)]
        return _cat_batched(
            [self._frame_with_gt(seq, fid).temporal() for fid in frame_ids],
            axis_name="T")
