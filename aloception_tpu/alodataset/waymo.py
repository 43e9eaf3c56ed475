"""Waymo Open Dataset (reference: alodataset/waymo_dataset.py:18 +
prepare/waymo_converter.py).

The reference converts TFRecords to an on-disk layout once (``prepare()``,
waymo_dataset.py:429) and then serves multi-camera temporal sequences:
getitem returns {camera: Frame(T, ...)} with boxes2d/boxes3d + calibration
(waymo_dataset.py:163-333). This port reads the same prepared layout:

    <dataset_dir>/<split>/<segment>/<camera>/{%06d.jpg, %06d.json}

where the json carries boxes2d (xcyc abs), boxes3d ([xc,yc,zc,Dx,Dy,Dz,h]),
class ids and the camera intrinsic. ``prepare()`` is gated on the optional
waymo-open-dataset package (TF is available, the package is not baked in).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..aloscene import (BoundingBoxes2D, BoundingBoxes3D, CameraExtrinsic,
                        CameraIntrinsic, Frame, Labels)
from ..aloscene.spatial import _cat_batched
from .base_dataset import BaseDataset, Split
from .mixins import SequenceMixin, SplitMixin

CAMERAS = ("front", "front_left", "front_right", "side_left", "side_right")
CLASSES = ("vehicle", "pedestrian", "sign", "cyclist")

# waymo axes (X fwd, Y left, Z up) -> aloception axes (X right, Y down,
# Z fwd) — reference waymo_dataset.py:15
_WAYMO2ALO = np.array([[0.0, -1.0, 0.0, 0.0], [0.0, 0.0, -1.0, 0.0],
                       [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]])


def _waymo_to_alo_boxes3d(b: np.ndarray) -> np.ndarray:
    """[cx,cy,cz,length,width,height,heading] waymo vehicle coords ->
    [xc,yc,zc,Dx,Dy,Dz,heading] aloception coords (reference
    waymo_dataset.py:264-293 np_convert_waymo_to_aloception...)."""
    center = b[:, :3] @ _WAYMO2ALO[:3, :3].T.astype(b.dtype)
    dims = b[:, [4, 5, 3]]
    heading = -b[:, 6:7]
    return np.concatenate([center, dims, heading], -1)


class WaymoDataset(SequenceMixin, SplitMixin, BaseDataset):

    SPLIT_FOLDERS = {Split.TRAIN: "train", Split.VAL: "validation",
                     Split.TEST: "testing"}

    def __init__(self, split: Split = Split.TRAIN,
                 cameras: List[str] = ("front",), sequence_size: int = 2,
                 labels: List[str] = ("gt_boxes_2d",), sample: bool = False,
                 **kwargs):
        self.split = split
        self.cameras = list(cameras)
        self.labels = list(labels)
        super().__init__(name="waymo", sample=sample,
                         sequence_size=sequence_size, **kwargs)
        if sample:
            self.items = list(range(4))
            return
        base = os.path.join(self.dataset_dir, self.get_split_folder())
        self.items = []
        for segment in sorted(os.listdir(base)):
            cam0_dir = os.path.join(base, segment, self.cameras[0])
            if not os.path.isdir(cam0_dir):
                continue
            frames = sorted(glob.glob(os.path.join(cam0_dir, "*.jpg")))
            ids = [int(os.path.splitext(os.path.basename(p))[0])
                   for p in frames]
            step = self.sequence_skip + 1
            span = (self.sequence_size - 1) * step
            for i in range(0, len(ids) - span):
                self.items.append(
                    (segment, [ids[i + k * step]
                               for k in range(self.sequence_size)]))
        self.base = base

    def _frame(self, segment: str, camera: str, fid: int) -> Frame:
        img = os.path.join(self.base, segment, camera, f"{fid:06d}.jpg")
        frame = Frame(img)
        meta_path = os.path.join(self.base, segment, camera, f"{fid:06d}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            H, W = frame.HW
            if "gt_boxes_2d" in self.labels and "boxes2d" in meta:
                b = np.asarray(meta["boxes2d"], np.float32).reshape(-1, 4)
                lab = Labels(np.asarray(meta.get("classes2d",
                                                 [0] * len(b)), np.float32),
                             labels_names=CLASSES)
                frame.append_boxes2d(BoundingBoxes2D(
                    b, "xcyc", True, frame_size=(H, W), labels=lab))
            if "gt_boxes_3d" in self.labels and "boxes3d" in meta:
                b3 = np.asarray(meta["boxes3d"], np.float32).reshape(-1, 7)
                b3 = _waymo_to_alo_boxes3d(b3)
                frame.append_boxes3d(BoundingBoxes3D(
                    b3, labels=Labels(
                        np.asarray(meta.get("classes3d", [0] * len(b3)),
                                   np.float32), labels_names=CLASSES)))
            if "intrinsic" in meta:
                frame.append_cam_intrinsic(CameraIntrinsic(
                    np.asarray(meta["intrinsic"], np.float32).reshape(3, 4)))
            if "extrinsic" in meta:
                # meta holds the raw WAYMO camera->vehicle 4x4; convert to
                # the aloception axes vehicle->camera transform exactly as
                # the reference does (waymo_dataset.py:249-256:
                # inv(E) then waymo2alo @ . @ inv(waymo2alo))
                E = np.asarray(meta["extrinsic"], np.float64).reshape(4, 4)
                ext = _WAYMO2ALO @ np.linalg.inv(E) @ np.linalg.inv(_WAYMO2ALO)
                frame.append_cam_extrinsic(
                    CameraExtrinsic(ext.astype(np.float32)))
        return frame

    def _getitem_sample(self, idx: int) -> Dict[str, Frame]:
        rng = np.random.RandomState(1200 + idx)
        out = {}
        for cam in self.cameras:
            frames = []
            for t in range(self.sequence_size):
                f = Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32))
                f.append_boxes2d(BoundingBoxes2D(
                    np.array([[0.5, 0.6, 0.2, 0.2]], np.float32), "xcyc",
                    False, labels=Labels(np.array([0.0], np.float32),
                                         labels_names=CLASSES)))
                frames.append(f.temporal())
            out[cam] = _cat_batched(frames, axis_name="T")
        return out

    def getitem(self, idx: int) -> Dict[str, Frame]:
        if self.sample:
            return self._getitem_sample(idx)
        segment, fids = self.items[idx]
        return {cam: _cat_batched(
            [self._frame(segment, cam, fid).temporal() for fid in fids],
            axis_name="T") for cam in self.cameras}

    @staticmethod
    def prepare(tfrecord_dir: str, out_dir: str):
        """TFRecord -> on-disk conversion. Dependency-free reimplementation
        of the reference converter (prepare/waymo_converter.py, 438 LoC):
        the TFRecord framing and the waymo Frame proto are parsed directly
        (see prepare/waymo_converter.py in this package), so neither
        tensorflow nor waymo-open-dataset is required."""
        from .prepare.waymo_converter import prepare as _prepare
        return _prepare(tfrecord_dir, out_dir)
