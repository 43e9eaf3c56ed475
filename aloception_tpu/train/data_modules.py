"""Data modules: datasets -> model-ready device batches
(reference: alonet/detr/data_modules/data2detr.py + coco_data2detr.py,
alonet/raft/data_modules/).

The reference pads each batch to its own max size (dynamic shapes). XLA wants
static shapes, so prepare_batch pads every batch to one canonical
``batch_size_hw`` (the batch_list mask marks the padding) — one compiled
train step for the whole run.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .. import aloscene
from ..alodataset import CocoBaseDataset, FlyingChairs2Dataset, Split
from ..alodataset import transforms as T
from ..models.detr.criterion import targets_from_frames


REFERENCE_SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]

# Canonical padded batch shapes for multi-scale training, (short, long),
# multiples of 64: every reference-scale output (shorter side 480-800,
# longer <= 1333, data2detr.py:153) fits one of these (or its transpose for
# portrait images), so the jitted train step compiles AT MOST once per
# bucket instead of once per unique image shape.
MULTISCALE_BUCKETS = ((512, 768), (512, 1344), (704, 960), (704, 1344),
                      (832, 1088), (832, 1344))


def pick_bucket(max_h: int, max_w: int,
                buckets=MULTISCALE_BUCKETS) -> Tuple[int, int]:
    """Smallest bucket (by area) covering (max_h, max_w), trying both
    orientations; falls back to the 64-rounded exact shape if none fits."""
    best = None
    for s, l in buckets:
        for bh, bw in ((s, l), (l, s)):
            if bh >= max_h and bw >= max_w:
                if best is None or bh * bw < best[0] * best[1]:
                    best = (bh, bw)
    if best is None:
        best = (-(-max_h // 64) * 64, -(-max_w // 64) * 64)
    return best


class CocoDetection2Detr:
    """(coco_data2detr.py / data2detr.py:131) COCO -> DETR batches.

    size=None (default) = the reference's multi-scale geometry: shorter side
    randomly in REFERENCE_SCALES with max_size 1333 (+ the resize-crop-resize
    branch, data2detr.py:153-163), batches padded to a small set of canonical
    buckets (MULTISCALE_BUCKETS) so recompilation is bounded. Pass an
    explicit (H, W) for single-shape training (smoke tests, fixed-size
    export)."""

    def __init__(self, batch_size: int = 2, num_workers: int = 2,
                 train_on_val: bool = False, sample: bool = False,
                 size: Optional[Tuple[int, int]] = None,
                 scales: Optional[List[int]] = None,
                 max_targets: int = 100, classes: Optional[List[str]] = None,
                 **dataset_kwargs):
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.size = size
        self.max_targets = max_targets

        if size is None:
            scales = scales or REFERENCE_SCALES
            max_size = 1333
            # (data2detr.py:153-163) flip + {multi-scale resize | resize +
            # crop + resize}; padding to buckets happens in prepare_batch
            self.train_transform = T.Compose([
                T.RandomHorizontalFlip(p=0.5),
                T.RandomSelect(
                    T.RandomResizeWithAspectRatio(scales, max_size=max_size),
                    T.Compose([
                        T.RandomResizeWithAspectRatio([400, 500, 600]),
                        T.RandomSizeCrop(384, 600),
                        T.RandomResizeWithAspectRatio(scales,
                                                      max_size=max_size),
                    ])),
            ])
            # (data2detr.py:197) shorter side 800, max 1333
            self.val_transform = T.RandomResizeWithAspectRatio(
                [scales[-1]], max_size=max_size)
        else:
            scales = scales or [392, 416, 448, 480]
            self.train_transform = T.Compose([
                T.RandomHorizontalFlip(p=0.5),
                T.RandomResizeWithAspectRatio(
                    scales, max_size=int(size[1] * 1.2)),
                T.Resize(tuple(size)),
            ])
            self.val_transform = T.Resize(tuple(size))

        def make(split, tfn):
            if sample:
                return CocoBaseDataset(
                    sample=True,
                    transform_fn=lambda f: tfn(f).norm_resnet(),
                    **dataset_kwargs)
            from ..alodataset import CocoDetectionDataset
            return CocoDetectionDataset(
                split=split, classes=classes,
                transform_fn=lambda f: tfn(f).norm_resnet(), **dataset_kwargs)

        self.train_dataset = make(
            Split.VAL if train_on_val else Split.TRAIN, self.train_transform)
        self.val_dataset = make(Split.VAL, self.val_transform)
        self.label_names = getattr(self.train_dataset, "labels_names", None)

    def train_dataloader(self):
        return self.train_dataset.train_loader(
            batch_size=self.batch_size, num_workers=self.num_workers)

    def val_dataloader(self):
        return self.val_dataset.train_loader(
            batch_size=self.batch_size, num_workers=self.num_workers,
            shuffle=False)

    def prepare_batch(self, frames_list: List, training: bool = True) -> Dict:
        """list[Frame] -> {"inputs": (images NHWC, mask), "targets", "frames"}
        (the LitDetr.training_step preamble, detr/train.py:129-311). In
        multi-scale mode the batch is padded to its canonical bucket."""
        bucket = None
        if self.size is None:
            max_h = max(f.H for f in frames_list if f is not None)
            max_w = max(f.W for f in frames_list if f is not None)
            bucket = pick_bucket(max_h, max_w)
        batched = aloscene.batch_list(frames_list, size=bucket)
        images = np.asarray(batched.as_layout(("B", "H", "W", "C")),
                            np.float32)
        mask = np.asarray(
            batched.mask.as_layout(("B", "H", "W", "C")), np.float32)[..., 0]
        targets = targets_from_frames(batched, max_targets=self.max_targets)
        return {"inputs": (images, mask), "targets": targets,
                "frames": batched}


class Data2RAFT:
    """(raft/data_modules/: chairs2raft, things2raft, sdhom2raft,
    sintel2raft) flow datasets -> RAFT batches; pick with ``dataset``."""

    DATASETS = ("chairs", "things", "sdhom", "sintel")

    def __init__(self, batch_size: int = 2, num_workers: int = 2,
                 sample: bool = False, size: Tuple[int, int] = (368, 496),
                 dataset: str = "chairs", **dataset_kwargs):
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.size = size
        if dataset == "chairs":
            cls = FlyingChairs2Dataset
        elif dataset == "things":
            from ..alodataset.flying_things import FlyingThings3DSubsetDataset
            cls = FlyingThings3DSubsetDataset
        elif dataset == "sdhom":
            from ..alodataset.flying_things import ChairsSDHomDataset
            cls = ChairsSDHomDataset
        elif dataset == "sintel":
            from ..alodataset import SintelFlowDataset
            cls = SintelFlowDataset
        else:
            raise ValueError(f"dataset must be one of {self.DATASETS}")
        self.train_dataset = cls(split=Split.TRAIN, sample=sample,
                                 **dataset_kwargs)
        self.val_dataset = cls(
            split=Split.VAL if not sample else Split.TRAIN, sample=sample,
            **dataset_kwargs)

    def train_dataloader(self):
        return self.train_dataset.train_loader(
            batch_size=self.batch_size, num_workers=self.num_workers)

    def val_dataloader(self):
        return self.val_dataset.train_loader(
            batch_size=self.batch_size, num_workers=self.num_workers,
            shuffle=False)

    def prepare_batch(self, frames_list: List, training: bool = True) -> Dict:
        """T=2 frames -> {"inputs": (frame1, frame2), "targets": (flow, valid)}
        (LitRAFT train preamble, raft/train.py:73; minmax_sym norm per
        raft.py:157)."""
        f1s, f2s, flows, valids = [], [], [], []
        for frames in frames_list:
            frames = frames.norm_minmax_sym() \
                if hasattr(frames, "norm_minmax_sym") else frames
            f1 = frames[0]
            f2 = frames[1]
            flow_slot = f1.get_child("flow")
            if isinstance(flow_slot, dict):
                flow_slot = flow_slot.get("flow_forward",
                                          next(iter(flow_slot.values())))
            flow = np.asarray(flow_slot.as_numpy(), np.float32)
            occ = flow_slot.get_child("occlusion")
            valid = 1.0 - (np.asarray(occ.as_numpy(), np.float32)[0]
                           if occ is not None and not isinstance(occ, dict)
                           else np.zeros(flow.shape[1:], np.float32))
            f1s.append(np.asarray(f1.as_layout(("H", "W", "C")), np.float32))
            f2s.append(np.asarray(f2.as_layout(("H", "W", "C")), np.float32))
            flows.append(np.moveaxis(flow, 0, -1))
            valids.append(valid)
        return {"inputs": (np.stack(f1s), np.stack(f2s)),
                "targets": {"flow": np.stack(flows),
                            "valid": np.stack(valids)}}
