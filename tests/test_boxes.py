"""BoundingBoxes2D conversions / IoU / GIoU / NMS (mirrors reference
unittest/test_boxes.py)."""

import numpy as np
import pytest

from aloception_tpu.aloscene import BoundingBoxes2D, Labels
from aloception_tpu.ops import boxes as box_ops


def _boxes(fmt="xcyc", absolute=False, frame_size=None):
    data = np.array([[0.5, 0.5, 0.2, 0.2],
                     [0.3, 0.7, 0.1, 0.4],
                     [0.8, 0.2, 0.2, 0.2]], np.float32)
    return BoundingBoxes2D(data, boxes_format=fmt, absolute=absolute,
                           frame_size=frame_size)


@pytest.mark.parametrize("path", [
    ("xyxy", "xcyc"), ("yxyx", "xcyc"), ("xyxy", "yxyx"),
])
def test_format_roundtrip(path):
    b = _boxes()
    via, back = path
    out = b.get_with_format(via).get_with_format(back).get_with_format("xcyc")
    assert np.abs(out.as_numpy() - b.as_numpy()).max() < 1e-6


def test_abs_rel_roundtrip():
    b = _boxes()
    babs = b.abs_pos((100, 200))
    assert babs.absolute and babs.frame_size == (100, 200)
    assert np.allclose(babs.as_numpy()[0], [100, 50, 40, 20], atol=1e-4)
    brel = babs.rel_pos()
    assert np.abs(brel.as_numpy() - b.as_numpy()).max() < 1e-6
    # re-scale absolute to another frame size
    b2 = babs.abs_pos((50, 100))
    assert np.allclose(b2.as_numpy(), babs.as_numpy() / 2, atol=1e-4)


def test_yxyx_abs_scaling_order():
    """yxyx scales (h, w, h, w) (bounding_boxes_2d.py:260-344)."""
    b = _boxes().yxyx().abs_pos((100, 200))
    expect = _boxes().abs_pos((100, 200)).yxyx()
    assert np.abs(b.as_numpy() - expect.as_numpy()).max() < 1e-4


def test_area():
    b = _boxes()
    assert np.allclose(np.asarray(b.area()), [0.04, 0.04, 0.04], atol=1e-6)
    babs = b.abs_pos((100, 100))
    assert np.allclose(np.asarray(babs.area()), [400, 400, 400], atol=1e-2)


def test_iou_giou():
    b = _boxes()
    iou = np.asarray(b.iou_with(b))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-5)
    giou = np.asarray(b.giou_with(b))
    assert np.allclose(np.diag(giou), 1.0, atol=1e-5)
    assert (giou <= iou + 1e-6).all()
    # disjoint boxes: iou 0, giou < 0
    a = BoundingBoxes2D(np.array([[0., 0., 0.1, 0.1]], np.float32), "xyxy", False)
    c = BoundingBoxes2D(np.array([[0.9, 0.9, 1.0, 1.0]], np.float32), "xyxy", False)
    assert np.asarray(a.iou_with(c))[0, 0] == 0
    assert np.asarray(a.giou_with(c))[0, 0] < 0


def test_iou_mixed_states():
    b = _boxes()
    babs = b.abs_pos((64, 64))
    iou = np.asarray(b.iou_with(babs))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-4)


def test_nms():
    boxes = BoundingBoxes2D(np.array([
        [0.0, 0.0, 0.5, 0.5],
        [0.01, 0.01, 0.5, 0.5],   # near-duplicate of 0
        [0.6, 0.6, 0.9, 0.9],
    ], np.float32), "xyxy", False)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = boxes.nms(scores, iou_threshold=0.5)
    assert list(keep) == [0, 2]


def test_hflip_abs():
    b = _boxes().abs_pos((100, 200))
    fb = b.hflip()
    assert fb.absolute and fb.boxes_format == "xcyc"
    assert np.allclose(fb.as_numpy()[0], [100, 50, 40, 20], atol=1e-3)
    assert np.allclose(fb.as_numpy()[1], [(1 - 0.3) * 200, 70, 20, 40], atol=1e-3)


def test_labels_filtered_with_boxes():
    b = _boxes()
    b.append_labels(Labels(np.array([1., 2., 3.], np.float32)))
    c = b._crop((0.4, 1.0), (0.4, 1.0))
    assert c.shape[0] == c.labels.shape[0]


def test_batched_giou_jit():
    import jax
    import jax.numpy as jnp
    b1 = jnp.asarray(np.random.RandomState(0).uniform(0.2, 0.4, (4, 10, 4)))
    b2 = b1 + 0.01

    @jax.jit
    def f(a, b):
        return box_ops.giou_xyxy(box_ops.xcyc_to_xyxy(a), box_ops.xcyc_to_xyxy(b))

    out = f(b1, b2)
    assert out.shape == (4, 10, 10)
