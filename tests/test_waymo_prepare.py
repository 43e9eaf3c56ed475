"""Waymo prepare(): synthetic TFRecord -> prepared layout roundtrip
(reference contract: alodataset/prepare/waymo_converter.py)."""

import json
import os

import numpy as np

from aloception_tpu.alodataset.prepare import waymo_converter as wc


def _jpeg_bytes(seed=0, size=(32, 48)):
    import cv2
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (size[0], size[1], 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    return enc.tobytes()


def _encode_box(cx, cy, cz, ln, w, h, heading):
    return (wc.field_double(1, cx) + wc.field_double(2, cy)
            + wc.field_double(3, cz) + wc.field_double(4, ln)
            + wc.field_double(5, w) + wc.field_double(6, h)
            + wc.field_double(7, heading))


def _encode_label(box: bytes, typ: int, lid: str):
    return (wc.field_bytes(1, box) + wc.field_varint(3, typ)
            + wc.field_bytes(4, lid.encode()))


# camera->vehicle 4x4 (waymo axes): yaw 0.3 about z + translation
_YAW = 0.3
_EXTRINSIC = np.array(
    [[np.cos(_YAW), -np.sin(_YAW), 0.0, 1.5],
     [np.sin(_YAW), np.cos(_YAW), 0.0, 0.2],
     [0.0, 0.0, 1.0, 2.0],
     [0.0, 0.0, 0.0, 1.0]])


def _encode_frame(frame_idx: int):
    ctx = wc.field_bytes(1, b"segment-test")
    calib = (wc.field_varint(1, 1)
             + wc.packed_doubles(2, [100.0, 110.0, 24.0, 16.0,
                                     0, 0, 0, 0, 0])
             + wc.field_bytes(3, wc.packed_doubles(
                 1, list(_EXTRINSIC.ravel())))
             + wc.field_varint(4, 48) + wc.field_varint(5, 32))
    ctx += wc.field_bytes(2, calib)
    img = wc.field_varint(1, 1) + wc.field_bytes(2, _jpeg_bytes(frame_idx))
    cam_label = _encode_label(_encode_box(20, 10, 0, 8, 6, 0, 0), 1, "veh-1")
    sign_label = _encode_label(_encode_box(5, 5, 0, 2, 2, 0, 0), 3, "sign-1")
    cam_labels = (wc.field_varint(1, 1) + wc.field_bytes(2, cam_label)
                  + wc.field_bytes(2, sign_label))
    laser = _encode_label(_encode_box(1, 2, 3, 4, 2, 1.5, 0.3), 2, "ped-1")
    pose = wc.packed_doubles(1, list(np.eye(4, dtype=np.float64).ravel()))
    return (wc.field_bytes(1, ctx)
            + wc.field_varint(2, 1234567 + frame_idx)
            + wc.field_bytes(3, pose)
            + wc.field_bytes(4, img)
            + wc.field_bytes(6, laser)
            + wc.field_bytes(8, cam_labels))


def test_waymo_prepare_roundtrip(tmp_path):
    rec_dir = tmp_path / "records"
    out_dir = tmp_path / "prepared" / "train"
    rec_dir.mkdir()
    wc.write_tfrecord(
        str(rec_dir / "segment-test_with_camera_labels.tfrecord"),
        [_encode_frame(i) for i in range(3)])

    from aloception_tpu.alodataset.waymo import WaymoDataset
    segs = WaymoDataset.prepare(str(rec_dir), str(out_dir))
    assert len(segs) == 1

    cam_dir = out_dir / "segment-test" / "front"
    jpgs = sorted(os.listdir(cam_dir))
    assert "000000.jpg" in jpgs and "000002.json" in jpgs

    meta = json.loads((cam_dir / "000001.json").read_text())
    # the SIGN label is filtered (reference default keeps veh/ped/cyc)
    assert meta["boxes2d"] == [[20.0, 10.0, 8.0, 6.0]]
    assert meta["classes2d"] == [0]
    assert meta["boxes3d"] == [[1.0, 2.0, 3.0, 4.0, 2.0, 1.5, 0.3]]
    assert meta["classes3d"] == [1]
    assert meta["intrinsic"][0][0] == 100.0
    assert meta["intrinsic"][1][2] == 16.0
    assert meta["timestamp"] == 1234568

    # the prepared layout is consumable by the dataset reader
    ds = WaymoDataset(split=__import__(
        "aloception_tpu.alodataset", fromlist=["Split"]).Split.TRAIN,
        dataset_dir=str(tmp_path / "prepared"), sequence_size=2,
        labels=("gt_boxes_2d", "gt_boxes_3d"))
    item = ds.getitem(0)
    frame = item["front"]
    assert frame.HW == (32, 48)
    boxes = frame.get_child("boxes2d")
    assert boxes is not None

    # extrinsic roundtrip: meta stores the raw waymo camera->vehicle 4x4
    assert np.allclose(np.asarray(meta["extrinsic"]), _EXTRINSIC)
    # ...and the reader attaches the alo-axes vehicle->camera transform
    # (waymo_dataset.py:249-256: inv(E) conjugated by waymo2alo)
    from aloception_tpu.alodataset.waymo import _WAYMO2ALO
    ext = frame.get_child("cam_extrinsic")
    assert ext is not None
    got = np.asarray(ext.as_numpy()).reshape(-1, 4, 4)[0]
    want = _WAYMO2ALO @ np.linalg.inv(_EXTRINSIC) @ np.linalg.inv(_WAYMO2ALO)
    assert np.allclose(got, want, atol=1e-5)


def test_boxes3d_hflip_with_extrinsic_roundtrip(tmp_path):
    """Frame.hflip passes the attached cam_extrinsic into boxes3d._hflip
    (reference boxes_3d_hflip, bounding_boxes_3d.py:219): centers flip in
    the CAMERA frame, headings become -h - 2*rot_y. Double flip must be the
    identity, and with E=I the flip must reduce to plain x/heading negation."""
    from aloception_tpu.aloscene import (BoundingBoxes3D, CameraExtrinsic,
                                         Frame)

    rng = np.random.RandomState(0)
    b3 = np.concatenate(
        [rng.uniform(-5, 5, (4, 3)), rng.uniform(1, 3, (4, 3)),
         rng.uniform(-1, 1, (4, 1))], -1).astype(np.float32)
    th = 0.4
    E = np.array([[np.cos(th), 0, np.sin(th), 0.5],
                  [0, 1, 0, -0.1],
                  [-np.sin(th), 0, np.cos(th), 1.0],
                  [0, 0, 0, 1]], np.float32)

    frame = Frame(rng.uniform(0, 1, (3, 16, 24)).astype(np.float32))
    frame.append_boxes3d(BoundingBoxes3D(b3.copy()))
    frame.append_cam_extrinsic(CameraExtrinsic(E))

    once = frame.hflip()
    flipped = np.asarray(once.get_child("boxes3d").as_numpy())
    # heading: -h - 2*rot_y where rot_y(E) = th
    assert np.allclose(flipped[:, 6], -b3[:, 6] - 2 * th, atol=1e-4)
    # centers move: camera-frame x negation conjugated by E
    ones = np.ones((4, 1), np.float32)
    cam = np.concatenate([b3[:, :3], ones], -1) @ E.T
    cam[:, 0] = -cam[:, 0]
    back = cam @ np.linalg.inv(E).T
    assert np.allclose(flipped[:, :3], back[:, :3], atol=1e-4)
    # involution: flipping twice restores the original boxes
    twice = np.asarray(once.hflip().get_child("boxes3d").as_numpy())
    assert np.allclose(twice, b3, atol=1e-4)

    # no extrinsic -> plain camera-frame negation
    f2 = Frame(rng.uniform(0, 1, (3, 16, 24)).astype(np.float32))
    f2.append_boxes3d(BoundingBoxes3D(b3.copy()))
    plain = np.asarray(f2.hflip().get_child("boxes3d").as_numpy())
    assert np.allclose(plain[:, 0], -b3[:, 0])
    assert np.allclose(plain[:, 6], -b3[:, 6])
