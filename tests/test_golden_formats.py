"""Format parsers against vendored GOLDEN files.

The fixture bytes in tests/fixtures/ were hand-assembled straight from the
public format specifications (Middlebury .flo, PFM, CrowdHuman odgt, KITTI
calib, COCO panoptic id-PNG) — independent of this repo's readers — so these
tests catch format bugs that synthetic write-then-read roundtrips cannot.
"""

import json
import os

import numpy as np

FX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_flo_golden():
    from aloception_tpu.aloscene.io.flow import load_flow_flo
    flow = load_flow_flo(os.path.join(FX, "golden.flo"))
    want = np.load(os.path.join(FX, "golden_flo_expected.npy"))
    # reader returns (2, H, W) or (H, W, 2); normalize to (H, W, 2)
    if flow.shape[0] == 2:
        flow = np.moveaxis(flow, 0, -1)
    assert flow.shape == (2, 3, 2)
    np.testing.assert_allclose(flow, want, rtol=0, atol=0)


def test_pfm_golden():
    from aloception_tpu.aloscene.io.disparity import load_pfm
    got = np.asarray(load_pfm(os.path.join(FX, "golden.pfm")))
    want = np.load(os.path.join(FX, "golden_pfm_expected.npy"))
    got = got.reshape(want.shape)
    # PFM stores rows bottom-up; the reader must flip to top-down
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_odgt_golden(tmp_path):
    """CrowdHumanDataset parses a real odgt line: person kept, the 'mask'
    (ignore) record filtered (crowd_human_dataset.py:40-46)."""
    import shutil
    import cv2
    root = tmp_path / "crowdhuman"
    (root / "CrowdHuman_train" / "Images").mkdir(parents=True)
    cv2.imwrite(str(root / "CrowdHuman_train" / "Images" / "img0001.jpg"),
                np.zeros((80, 60, 3), np.uint8))
    shutil.copy(os.path.join(FX, "golden.odgt"),
                root / "annotation_train.odgt")

    from aloception_tpu.alodataset import CrowdHumanDataset, Split
    ds = CrowdHumanDataset(split=Split.TRAIN, dataset_dir=str(root))
    frame = ds.getitem(0)
    boxes = frame.get_child("boxes2d")
    arr = np.asarray(boxes.abs_pos((80, 60)).xyxy().as_numpy()).reshape(-1, 4)
    # fbox [x, y, w, h] = [10, 20, 30, 60] -> xyxy [10, 20, 40, 80]
    assert any(np.allclose(a, [10, 20, 40, 80], atol=1e-3) for a in arr)
    # the non-person ('mask' tag) record must be filtered
    assert len(arr) == 1


def test_kitti_calib_golden():
    from aloception_tpu.alodataset.utils.kitti import (
        load_calib_cam_to_cam, intrinsic_from_calib, baseline_from_calib)
    calib = load_calib_cam_to_cam(
        os.path.join(FX, "golden_calib_cam_to_cam.txt"))
    K = intrinsic_from_calib(calib, cam=2)
    K = np.asarray(K)
    assert abs(K[0, 0] - 721.5377) < 1e-3
    assert abs(K[0, 2] - 609.5593) < 1e-3
    b = baseline_from_calib(calib)
    # KITTI baseline = (P2_tx - P3_tx) / fx = (44.857 - -339.52) / 721.54
    assert b is not None and abs(b - 0.5327) < 2e-3


def test_panoptic_png_golden():
    import cv2
    from aloception_tpu.alodataset.coco_panoptic import rgb2id
    bgr = cv2.imread(os.path.join(FX, "golden_panoptic.png"),
                     cv2.IMREAD_COLOR)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    ids = rgb2id(rgb)
    want = np.load(os.path.join(FX, "golden_panoptic_ids.npy"))
    np.testing.assert_array_equal(np.asarray(ids, np.int64), want)
