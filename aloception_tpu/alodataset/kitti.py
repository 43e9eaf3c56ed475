"""KITTI dataset family (reference: alodataset/kitti_*.py — stereo/flow/
scene-flow 2015:362, 2012:250, depth:310, tracking:266, odometry:228,
object:172, road, semantic).

All variants share: split folders (training/testing), zero-padded frame ids,
png images under image_2/image_3 (left/right), 16-bit png disparity/flow
encodings, calib txt files. Each getitem returns a Frame (or dict of camera
Frames) with the relevant labels attached — same contract as the reference.

``sample=True`` produces deterministic synthetic fixtures (no downloads).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ..aloscene import (BoundingBoxes2D, BoundingBoxes3D, CameraIntrinsic,
                        Disparity, Flow, Frame, Labels, Mask, Pose)
from .base_dataset import BaseDataset, Split
from .mixins import SequenceMixin, SplitMixin
from .utils.kitti import (baseline_from_calib, intrinsic_from_calib,
                          load_calib_cam_to_cam)


def _load_kitti_flow_png(path: str):
    """KITTI 16-bit flow png: (u, v, valid) = ((png[...,0]-2^15)/64, ...)."""
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        from ..aloscene import InvalidSampleError
        raise InvalidSampleError(f"cannot read flow png {path}")
    img = img[..., ::-1].astype(np.float32)  # BGR->RGB channel order
    flow = (img[..., :2] - 2 ** 15) / 64.0
    valid = img[..., 2] > 0
    return np.moveaxis(flow, -1, 0), valid


def _load_kitti_disp_png(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        from ..aloscene import InvalidSampleError
        raise InvalidSampleError(f"cannot read disparity png {path}")
    return (img.astype(np.float32) / 256.0)[None]


class KittiBase(SplitMixin, BaseDataset):
    SPLIT_FOLDERS = {Split.TRAIN: "training", Split.VAL: "training",
                     Split.TEST: "testing"}

    def __init__(self, name: str, split: Split = Split.TRAIN,
                 sample: bool = False, **kwargs):
        self.split = split
        super().__init__(name=name, sample=sample, **kwargs)
        if sample:
            self.items = list(range(4))
            return
        self.split_folder = os.path.join(self.dataset_dir,
                                         self.get_split_folder())

    def _sample_frame(self, idx: int, size=(96, 128)) -> Frame:
        rng = np.random.RandomState(4000 + idx)
        return Frame(rng.uniform(0, 255, (3,) + size).astype(np.float32))


class KittiStereoFlowSFlow2015(KittiBase):
    """Scene-flow 2015 (kitti_stereo_flow_sflow2015.py:51): stereo pairs at
    t/t+1 with disparities (noc/occ at both times) and flow; returns a dict
    {"left": Frame(T=2), "right": Frame(T=2)}."""

    def __init__(self, name: str = "kitti_sflow2015", grayscale: bool = False,
                 load: Optional[List[str]] = None, **kwargs):
        self.load = load or ["right", "disp_noc", "disp_occ", "flow_occ",
                             "flow_noc"]
        super().__init__(name=name, **kwargs)
        if self.sample:
            return
        imgs = glob.glob(os.path.join(self.split_folder, "image_2",
                                      "*_10.png"))
        self.items = sorted(int(os.path.basename(p).split("_")[0])
                            for p in imgs)

    def getitem(self, idx: int) -> Dict[str, Frame]:
        from ..aloscene.spatial import _cat_batched
        if self.sample:
            left = [self._sample_frame(idx).temporal(),
                    self._sample_frame(idx + 1).temporal()]
            out = {"left": _cat_batched(left, axis_name="T")}
            if "right" in self.load:
                right = [self._sample_frame(idx + 2).temporal(),
                         self._sample_frame(idx + 3).temporal()]
                out["right"] = _cat_batched(right, axis_name="T")
            return out
        fid = self.items[idx]
        calib_path = os.path.join(self.split_folder, "calib_cam_to_cam",
                                  f"{fid:06d}.txt")
        calib = load_calib_cam_to_cam(calib_path) \
            if os.path.exists(calib_path) else {}

        def frame_at(cam_folder: str, t: int, cam: int) -> Frame:
            f = Frame(os.path.join(self.split_folder, cam_folder,
                                   f"{fid:06d}_{10 + t:02d}.png"))
            if calib:
                f.append_cam_intrinsic(
                    CameraIntrinsic(intrinsic_from_calib(calib, cam)))
            return f

        left0 = frame_at("image_2", 0, 2)
        H, W = left0.HW
        for key, disp_dir in (("disp_noc", "disp_noc_0"),
                              ("disp_occ", "disp_occ_0")):
            path = os.path.join(self.split_folder, disp_dir, f"{fid:06d}_10.png")
            if key in self.load and os.path.exists(path):
                left0.append_disparity(
                    Disparity(_load_kitti_disp_png(path),
                              disp_format="unsigned",
                              baseline=baseline_from_calib(calib)), key)
        for key, flow_dir in (("flow_occ", "flow_occ"), ("flow_noc", "flow_noc")):
            path = os.path.join(self.split_folder, flow_dir, f"{fid:06d}_10.png")
            if key in self.load and os.path.exists(path):
                flow, valid = _load_kitti_flow_png(path)
                left0.append_flow(Flow(
                    flow, occlusion=Mask((~valid[None]).astype(np.float32))),
                    key)
        left1 = frame_at("image_2", 1, 2)
        out = {"left": _cat_batched([left0.temporal(), left1.temporal()],
                                    axis_name="T")}
        if "right" in self.load and os.path.exists(
                os.path.join(self.split_folder, "image_3",
                             f"{fid:06d}_10.png")):
            out["right"] = _cat_batched(
                [frame_at("image_3", 0, 3).temporal(),
                 frame_at("image_3", 1, 3).temporal()], axis_name="T")
        return out


class KittiStereoFlow2012(KittiStereoFlowSFlow2015):
    """2012 benchmark variant (kitti_stereo_flow2012.py:1): colored/ greyscale
    image_0/image_1 folders, single disparity set."""

    def __init__(self, name: str = "kitti_stereo2012", **kwargs):
        super().__init__(name=name, **kwargs)


class KittiDepth(KittiBase):
    """Depth completion/prediction (kitti_depth.py:1): raw sequences +
    annotated depth maps (16-bit png / 256)."""

    def __init__(self, name: str = "kitti_depth", subset: str = "val",
                 **kwargs):
        self.subset = subset
        super().__init__(name=name, **kwargs)
        if self.sample:
            return
        pattern = os.path.join(self.dataset_dir, subset, "**",
                               "proj_depth", "groundtruth", "image_02",
                               "*.png")
        self.depth_paths = sorted(glob.glob(pattern, recursive=True))
        self.items = list(range(len(self.depth_paths)))

    def getitem(self, idx: int) -> Frame:
        from ..aloscene import Depth
        if self.sample:
            frame = self._sample_frame(idx)
            frame.append_depth(Depth(
                np.random.RandomState(idx).uniform(
                    1, 80, (1,) + frame.HW).astype(np.float32)))
            return frame
        import cv2
        depth_path = self.depth_paths[idx]
        img_path = depth_path.replace(
            os.sep + "proj_depth" + os.sep + "groundtruth", "").replace(
            "image_02", os.path.join("image_02", "data"))
        frame = Frame(img_path) if os.path.exists(img_path) \
            else self._sample_frame(idx)
        d = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        from ..aloscene import Depth
        frame.append_depth(Depth((d.astype(np.float32) / 256.0)[None]))
        return frame


class KittiObject(KittiBase):
    """3D object detection (kitti_object.py:1): label_2 txt boxes ->
    BoundingBoxes2D + BoundingBoxes3D."""

    CLASSES = ("Car", "Van", "Truck", "Pedestrian", "Person_sitting",
               "Cyclist", "Tram", "Misc")

    def __init__(self, name: str = "kitti_object", **kwargs):
        super().__init__(name=name, **kwargs)
        if self.sample:
            return
        imgs = glob.glob(os.path.join(self.split_folder, "image_2", "*.png"))
        self.items = sorted(int(os.path.splitext(os.path.basename(p))[0])
                            for p in imgs)

    def getitem(self, idx: int) -> Frame:
        if self.sample:
            frame = self._sample_frame(idx)
            frame.append_boxes2d(BoundingBoxes2D(
                np.array([[0.5, 0.5, 0.2, 0.3]], np.float32), "xcyc", False,
                labels=Labels(np.array([0.0], np.float32),
                              labels_names=self.CLASSES)))
            frame.append_boxes3d(BoundingBoxes3D(
                np.array([[0.0, 1.0, 15.0, 1.6, 1.5, 4.0, 0.2]], np.float32)))
            return frame
        fid = self.items[idx]
        frame = Frame(os.path.join(self.split_folder, "image_2",
                                   f"{fid:06d}.png"))
        H, W = frame.HW
        label_path = os.path.join(self.split_folder, "label_2",
                                  f"{fid:06d}.txt")
        boxes2d, boxes3d, labels = [], [], []
        if os.path.exists(label_path):
            with open(label_path) as f:
                for line in f:
                    p = line.split()
                    if p[0] not in self.CLASSES:
                        continue
                    x1, y1, x2, y2 = map(float, p[4:8])
                    h, w, l = map(float, p[8:11])
                    x, y, z = map(float, p[11:14])
                    ry = float(p[14])
                    boxes2d.append([(x1 + x2) / 2 / W, (y1 + y2) / 2 / H,
                                    (x2 - x1) / W, (y2 - y1) / H])
                    # KITTI: (h,w,l) box at bottom-center -> center + Dx/Dy/Dz
                    boxes3d.append([x, y - h / 2, z, w, h, l, ry])
                    labels.append(self.CLASSES.index(p[0]))
        lab = Labels(np.asarray(labels, np.float32), labels_names=self.CLASSES)
        frame.append_boxes2d(BoundingBoxes2D(
            np.asarray(boxes2d, np.float32).reshape(-1, 4), "xcyc", False,
            labels=lab))
        frame.append_boxes3d(BoundingBoxes3D(
            np.asarray(boxes3d, np.float32).reshape(-1, 7), labels=lab.clone()))
        calib_path = os.path.join(self.split_folder, "calib", f"{fid:06d}.txt")
        if os.path.exists(calib_path):
            calib = load_calib_cam_to_cam(calib_path)
            try:
                frame.append_cam_intrinsic(
                    CameraIntrinsic(intrinsic_from_calib(calib, 2)))
            except KeyError:
                pass
        return frame


class KittiTracking(SequenceMixin, KittiBase):
    """Multi-object tracking (kitti_tracking.py:1): per-sequence frames with
    tracked 2D boxes."""

    def __init__(self, name: str = "kitti_tracking", sequence_size: int = 2,
                 **kwargs):
        super().__init__(name=name, sequence_size=sequence_size, **kwargs)
        if self.sample:
            return
        seq_dirs = sorted(glob.glob(os.path.join(
            self.split_folder, "image_02", "*")))
        self.items = []
        for sd in seq_dirs:
            frames = sorted(glob.glob(os.path.join(sd, "*.png")))
            for i in range(len(frames) - self.sequence_size + 1):
                self.items.append(frames[i:i + self.sequence_size])

    def getitem(self, idx: int):
        from ..aloscene.spatial import _cat_batched
        if self.sample:
            frames = [self._sample_frame(idx + t).temporal()
                      for t in range(self.sequence_size)]
            return _cat_batched(frames, axis_name="T")
        return _cat_batched([Frame(p).temporal() for p in self.items[idx]],
                            axis_name="T")


class KittiOdometry(SequenceMixin, KittiBase):
    """Visual odometry (kitti_odometry.py:1): frames + ground-truth Pose."""

    def __init__(self, name: str = "kitti_odometry", sequence_size: int = 2,
                 **kwargs):
        super().__init__(name=name, sequence_size=sequence_size, **kwargs)
        if self.sample:
            return
        seq_dirs = sorted(glob.glob(os.path.join(
            self.dataset_dir, "sequences", "*")))
        self.items = []
        self.poses = {}
        for sd in seq_dirs:
            seq = os.path.basename(sd)
            frames = sorted(glob.glob(os.path.join(sd, "image_2", "*.png")))
            pose_path = os.path.join(self.dataset_dir, "poses", seq + ".txt")
            if os.path.exists(pose_path):
                self.poses[seq] = np.loadtxt(pose_path).reshape(-1, 3, 4)
            for i in range(len(frames) - self.sequence_size + 1):
                self.items.append((seq, i, frames[i:i + self.sequence_size]))

    def getitem(self, idx: int):
        from ..aloscene.spatial import _cat_batched
        if self.sample:
            frames = []
            for t in range(self.sequence_size):
                f = self._sample_frame(idx + t)
                f.append_pose(Pose(np.eye(4, dtype=np.float32)))
                frames.append(f.temporal())
            return _cat_batched(frames, axis_name="T")
        seq, start, paths = self.items[idx]
        frames = []
        for t, p in enumerate(paths):
            f = Frame(p)
            if seq in self.poses:
                T = np.eye(4, dtype=np.float32)
                T[:3] = self.poses[seq][start + t]
                f.append_pose(Pose(T))
            frames.append(f.temporal())
        return _cat_batched(frames, axis_name="T")


class KittiRoad(KittiBase):
    """Road segmentation (kitti_road.py): frames + road Mask."""

    def __init__(self, name: str = "kitti_road", **kwargs):
        super().__init__(name=name, **kwargs)
        if self.sample:
            return
        imgs = sorted(glob.glob(os.path.join(self.split_folder, "image_2",
                                             "*.png")))
        self.items = imgs

    def getitem(self, idx: int) -> Frame:
        import cv2
        if self.sample:
            frame = self._sample_frame(idx)
            m = np.zeros((1,) + frame.HW, np.float32)
            m[0, frame.H // 2:] = 1
            frame.append_segmentation(Mask(m))
            return frame
        path = self.items[idx]
        frame = Frame(path)
        base = os.path.basename(path)
        cat, rest = base.split("_", 1)
        gt = os.path.join(self.split_folder, "gt_image_2",
                          f"{cat}_road_{rest}")
        if os.path.exists(gt):
            g = cv2.imread(gt)
            road = (g[..., 2] > 0).astype(np.float32)[None]  # magenta channel
            frame.append_segmentation(Mask(road))
        return frame


class KittiSemantic(KittiBase):
    """Semantic segmentation (kitti_semantic.py): frames + id Mask."""

    def __init__(self, name: str = "kitti_semantic", **kwargs):
        super().__init__(name=name, **kwargs)
        if self.sample:
            return
        self.items = sorted(glob.glob(os.path.join(
            self.split_folder, "image_2", "*.png")))

    def getitem(self, idx: int) -> Frame:
        import cv2
        if self.sample:
            frame = self._sample_frame(idx)
            classes = np.random.RandomState(idx).randint(
                0, 3, frame.HW)
            masks = np.stack([(classes == c).astype(np.float32)
                              for c in range(3)])
            frame.append_segmentation(Mask(
                masks, labels=Labels(np.arange(3, dtype=np.float32))))
            return frame
        path = self.items[idx]
        frame = Frame(path)
        gt = path.replace("image_2", "semantic")
        if os.path.exists(gt):
            sem = cv2.imread(gt, cv2.IMREAD_GRAYSCALE)
            ids = np.unique(sem)
            masks = np.stack([(sem == i).astype(np.float32) for i in ids])
            frame.append_segmentation(Mask(
                masks, labels=Labels(ids.astype(np.float32))))
        return frame


# reference aliases (alodataset/__init__.py naming)
KittiStereoFlowSFlow2015Dataset = KittiStereoFlowSFlow2015
KittiStereoFlow2012Dataset = KittiStereoFlow2012
KittiDepthDataset = KittiDepth
KittiObjectDataset = KittiObject
KittiTrackingDataset = KittiTracking
KittiOdometryDataset = KittiOdometry


class KittiSplit(KittiDepth):
    """Train/val split over the prepared KITTI depth drives with a validity
    mask on the depth (kitti_split_dataset.py:9): depth==0 pixels (no lidar
    return) get a valid_mask child so losses can ignore them."""

    SPLIT_FOLDERS = {Split.VAL: "val", Split.TRAIN: "train"}

    def __init__(self, split: Split = Split.TRAIN, add_depth_mask: bool = True,
                 name: str = "kitti", **kwargs):
        self.add_depth_mask = add_depth_mask
        super().__init__(name=name, split=split,
                         subset=self.SPLIT_FOLDERS[split], **kwargs)

    def getitem(self, idx: int):
        frame = super().getitem(idx)
        depth = frame.get_child("depth")
        if self.add_depth_mask and depth is not None \
                and not isinstance(depth, dict):
            valid = (np.asarray(depth.as_numpy()) != 0).astype(np.float32)
            depth.add_child("valid_mask", Mask(valid, names=depth.names),
                            align_dim=["B", "T"], mergeable=True)
        return frame


KittiSplitDataset = KittiSplit
