"""Rotated IoU (2D/3D) vs analytic cases + BoundingBoxes3D/OrientedBoxes2D
(mirrors reference unittest/test_oriented_boxes_2d.py, test_boxes_3d.py,
test_projections.py and the numpy reference in rotated_iou/utiles.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aloception_tpu.ops import rotated_iou as riou
from aloception_tpu.aloscene import (
    BoundingBoxes3D, OrientedBoxes2D, CameraIntrinsic, Labels)


def test_identical_boxes_iou_one():
    b = jnp.asarray([[0.0, 0.0, 2.0, 1.0, 0.3]])
    iou = np.asarray(riou.cal_iou(b, b))
    assert np.allclose(iou, 1.0, atol=1e-4)


def test_axis_aligned_matches_classic():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[1.0, 0.0, 2.0, 2.0, 0.0]])  # half-overlap
    iou = float(np.asarray(riou.cal_iou(b1, b2))[0])
    # inter 2, union 6
    assert abs(iou - 2 / 6) < 1e-4


def test_rotation_invariance():
    """Rotating both boxes by the same angle preserves IoU."""
    rng = np.random.RandomState(0)
    for _ in range(5):
        xy = rng.uniform(-1, 1, 2)
        b1 = np.array([[0, 0, 2, 1, 0.2]], np.float32)
        b2 = np.array([[xy[0], xy[1], 1.5, 1, -0.4]], np.float32)
        iou0 = float(np.asarray(riou.cal_iou(jnp.asarray(b1), jnp.asarray(b2))))
        for dth in [0.3, 1.1]:
            c, s = np.cos(dth), np.sin(dth)
            def rot(b):
                b = b.copy()
                x, y = b[0, 0], b[0, 1]
                b[0, 0], b[0, 1] = c * x - s * y, s * x + c * y
                b[0, 4] += dth
                return b
            iou1 = float(np.asarray(riou.cal_iou(jnp.asarray(rot(b1)),
                                                 jnp.asarray(rot(b2)))))
            assert abs(iou0 - iou1) < 1e-3


def test_disjoint_giou_negative():
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.5]])
    b2 = jnp.asarray([[5.0, 5.0, 1.0, 1.0, 1.0]])
    giou, iou = riou.cal_giou(b1, b2)
    assert float(iou[0]) == 0.0
    assert float(giou[0]) < 0.0


def test_45_degree_cross():
    """Two unit squares, one rotated 45deg, same center: known analytic
    IoU = 2*(sqrt(2)-1)/(2-(sqrt(2)-1)... compute via octagon area
    inter = 8 * (sqrt(2) - 1) / 2 ... use known value 0.7071*... """
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    iou = float(np.asarray(riou.cal_iou(b1, b2))[0])
    # intersection is a regular octagon with area 8*(sqrt(2)-1)/2 ~= 0.8284
    inter = 2 * (np.sqrt(2) - 1)
    expected = inter / (2 - inter)
    assert abs(iou - expected) < 1e-3


def test_iou3d_identical_and_shifted():
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.3]])
    assert abs(float(np.asarray(riou.cal_iou_3d(b, b))[0]) - 1.0) < 1e-3
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.3]])
    # vertical half-overlap: inter = 4*1, union = 8+8-4
    assert abs(float(np.asarray(riou.cal_iou_3d(b, b2))[0]) - 4 / 12) < 1e-3


def test_diou_3d_center_distance_penalty():
    b = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[3.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    diou, iou3d = riou.cal_diou_3d(b, b2)
    assert float(iou3d[0]) == 0.0
    assert float(diou[0]) < 0.0


def test_oriented_boxes_2d_class():
    boxes = OrientedBoxes2D(np.array(
        [[4.0, 4.0, 2.0, 1.0, 0.0], [4.0, 4.0, 2.0, 1.0, np.pi / 2]],
        np.float32), absolute=True, frame_size=(10, 10))
    corners = boxes.corners()
    assert corners.shape == (2, 4, 2)
    iou = boxes.rotated_iou_with(boxes)
    assert np.allclose(np.diag(iou), 1.0, atol=1e-3)
    assert 0.2 < iou[0, 1] < 0.6  # perpendicular overlap = 1/3
    flipped = boxes.hflip()
    assert np.allclose(np.asarray(flipped.array)[:, 0], 6.0, atol=1e-5)


def test_boxes3d_vertices_and_projection():
    boxes = BoundingBoxes3D(np.array(
        [[0.0, 0.0, 10.0, 2.0, 1.5, 4.0, 0.0]], np.float32))
    v = boxes.get_vertices_3d()
    assert v.shape == (1, 8, 3)
    assert np.allclose(sorted(np.unique(v[0, :, 0]).tolist()), [-1, 1])
    assert np.allclose(v[0, :, 2].max(), 12.0)
    intrinsic = CameraIntrinsic(focal_length=100.0, plane_size=(100, 200))
    proj = boxes.get_vertices_3d_proj(intrinsic)
    assert proj.shape == (1, 8, 2)
    enc = boxes.get_enclosing_box_2d(intrinsic, frame_size=(100, 200))
    assert enc.boxes_format == "xyxy" and enc.absolute
    # projected box must contain the projected center (cx=100, cy=50)
    e = np.asarray(enc.as_numpy())[0]
    assert e[0] < 100 < e[2] and e[1] < 50 < e[3]


def test_boxes3d_iou3d_with():
    b1 = BoundingBoxes3D(np.array(
        [[0.0, 0.0, 10.0, 2.0, 2.0, 2.0, 0.0]], np.float32))
    iou = b1.iou3d_with(b1)
    assert abs(iou[0, 0] - 1.0) < 1e-3
    giou = b1.giou3d_with(b1)
    assert abs(giou[0, 0] - 1.0) < 1e-3


def test_ap_metrics_3d():
    from aloception_tpu.metrics import ApMetrics3D
    gt = BoundingBoxes3D(
        np.array([[0.0, 0.0, 10.0, 2.0, 2.0, 2.0, 0.0]], np.float32),
        labels=Labels(np.array([0.0], np.float32), labels_names=("car",)))
    pred = BoundingBoxes3D(
        np.array([[0.05, 0.0, 10.0, 2.0, 2.0, 2.0, 0.0]], np.float32),
        labels=Labels(np.array([0.0], np.float32), scores=np.array([0.9]),
                      labels_names=("car",)))
    m = ApMetrics3D()
    m.add_sample(pred, gt)
    maps = m.calc_map()
    assert maps["all"][50] > 90  # near-perfect detection
