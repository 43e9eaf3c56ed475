"""Long-tail datasets: sample fixtures exercise each reader's contract
(reference datasets per SURVEY.md §2.2)."""

import numpy as np
import pytest

import aloception_tpu.alodataset as alodataset
from aloception_tpu.aloscene import Frame


def test_mot17_sample_tracking_sequence():
    ds = alodataset.Mot17(sample=True, sequence_size=2)
    frames = ds[0]
    assert frames.names[0] == "T" and frames.shape[0] == 2
    f0 = frames[0]
    boxes = f0.boxes2d
    assert boxes.shape[-1] == 4
    assert boxes.labels is not None  # track ids


def test_crowdhuman_sample():
    ds = alodataset.CrowdHumanDataset(sample=True)
    f = ds[0]
    assert isinstance(f, Frame)
    assert f.boxes2d.labels.labels_names == ("person",)


def test_woodscape_sample():
    ds = alodataset.WooDScapeDataset(sample=True)
    f = ds[0]
    assert f.boxes2d.shape[0] >= 1


def test_waymo_sample_multicamera():
    ds = alodataset.WaymoDataset(sample=True,
                                 cameras=("front", "front_left"),
                                 sequence_size=2)
    out = ds[0]
    assert set(out) == {"front", "front_left"}
    assert out["front"].shape[0] == 2


def test_kitti_sflow_sample():
    ds = alodataset.KittiStereoFlowSFlow2015(sample=True)
    out = ds[0]
    assert "left" in out and out["left"].names[0] == "T"


def test_kitti_object_sample():
    ds = alodataset.KittiObjectDataset(sample=True)
    f = ds[0]
    assert f.boxes2d.shape[0] == 1
    assert f.boxes3d.shape[-1] == 7


def test_kitti_depth_tracking_odometry_road_semantic_samples():
    d1 = alodataset.KittiDepthDataset(sample=True)[0]
    assert d1.depth is not None
    d2 = alodataset.KittiTrackingDataset(sample=True, sequence_size=2)[0]
    assert d2.shape[0] == 2
    d3 = alodataset.KittiOdometryDataset(sample=True, sequence_size=2)[0]
    assert d3.shape[0] == 2
    from aloception_tpu.alodataset.kitti import KittiRoad, KittiSemantic
    assert KittiRoad(sample=True)[0].segmentation is not None
    assert KittiSemantic(sample=True)[0].segmentation.shape[0] == 3


def test_flying_things_and_sdhom_samples():
    for cls in (alodataset.FlyingThings3DSubsetDataset,
                alodataset.ChairsSDHomDataset):
        ds = cls(sample=True)
        frames = ds[0]
        assert frames.shape[0] == 2
        f0 = frames[0]
        flow = f0.get_child("flow")
        assert flow is not None


def test_coco_panoptic_sample():
    ds = alodataset.CocoPanopticDataset(sample=True)
    f = ds[0]
    seg = f.segmentation
    assert seg.shape[0] == f.boxes2d.shape[0]
    assert ds.isthing[0] is True and ds.isthing[2] is False
    # masks usable by PQ metric
    from aloception_tpu.metrics import PQMetrics
    pq = PQMetrics()
    pq.add_sample(seg, seg, isthing={i: t for i, t in ds.isthing.items()})
    assert pq.pq_average()["pq"] == 1.0


def test_kitti_flow_png_roundtrip(tmp_path):
    """KITTI 16-bit flow png encode/decode."""
    import cv2
    from aloception_tpu.alodataset.kitti import _load_kitti_flow_png
    flow = np.random.RandomState(0).uniform(-10, 10, (8, 8, 2)).astype(np.float32)
    enc = np.zeros((8, 8, 3), np.uint16)
    enc[..., 0] = (flow[..., 0] * 64 + 2 ** 15).astype(np.uint16)
    enc[..., 1] = (flow[..., 1] * 64 + 2 ** 15).astype(np.uint16)
    enc[..., 2] = 1
    path = str(tmp_path / "flow.png")
    cv2.imwrite(path, enc[..., ::-1])  # BGR on disk
    out, valid = _load_kitti_flow_png(path)
    assert valid.all()
    assert np.abs(np.moveaxis(out, 0, -1) - flow).max() < 1 / 32
