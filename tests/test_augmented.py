"""Core AugmentedArray invariants (mirrors reference unittest/test_augmented_tensor.py)."""

import numpy as np
import pytest

import jax

import aloception_tpu.aloscene as aloscene
from aloception_tpu.aloscene import Frame, BoundingBoxes2D, Labels, Mask, Disparity


def _frame(h=32, w=40, normalization="255", seed=0):
    rng = np.random.RandomState(seed)
    return Frame(rng.uniform(0, 255, (3, h, w)).astype(np.float32),
                 normalization=normalization)


def test_properties_and_children():
    f = _frame()
    assert f.normalization == "255"
    assert f.H == 32 and f.W == 40 and f.HW == (32, 40)
    boxes = BoundingBoxes2D(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                            boxes_format="xcyc", absolute=False)
    f.append_boxes2d(boxes)
    assert f.boxes2d is boxes
    # named sets
    f2 = _frame()
    f2.append_boxes2d(boxes, "gt")
    f2.append_boxes2d(boxes.clone(), "pred")
    assert set(f2.boxes2d.keys()) == {"gt", "pred"}


def test_pytree_roundtrip():
    f = _frame()
    boxes = BoundingBoxes2D(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                            boxes_format="xcyc", absolute=False,
                            labels=Labels(np.array([3.0], np.float32)))
    f.append_boxes2d(boxes)
    leaves, treedef = jax.tree_util.tree_flatten(f)
    f2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(f2, Frame)
    assert f2.normalization == f.normalization
    assert np.allclose(f2.as_numpy(), f.as_numpy())
    assert isinstance(f2.boxes2d, BoundingBoxes2D)
    assert f2.boxes2d.boxes_format == "xcyc"
    assert isinstance(f2.boxes2d.labels, Labels)
    # device_put keeps structure
    fd = jax.device_put(f)
    assert isinstance(fd.boxes2d.labels, Labels)


def test_jit_through_frame():
    f = _frame()

    @jax.jit
    def double(frame):
        return frame._with_array(frame.array * 2.0)

    out = double(jax.device_put(f))
    assert np.allclose(np.asarray(out.array), f.as_numpy() * 2.0)
    assert out.normalization == "255"


def test_batch_list_mask_and_children():
    """batch_list pads to max size and attaches a padded-area mask
    (spatial_augmented_tensor.py:322-419)."""
    f1 = _frame(32, 40)
    f2 = _frame(24, 36, seed=1)
    f1.append_boxes2d(BoundingBoxes2D(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                                      "xcyc", False))
    f2.append_boxes2d(BoundingBoxes2D(np.array([[0.4, 0.4, 0.2, 0.2],
                                                [0.6, 0.6, 0.1, 0.1]], np.float32),
                                      "xcyc", False))
    batched = aloscene.batch_list([f1, f2])
    assert batched.shape == (2, 3, 32, 40)
    assert batched.names == ("B", "C", "H", "W")
    mask = batched.mask
    assert mask.shape == (2, 1, 32, 40)
    m = mask.as_numpy()
    assert m[0].sum() == 0  # largest frame has no padding
    assert m[1].sum() == 32 * 40 - 24 * 36  # padded area flagged
    assert isinstance(batched.boxes2d, list) and len(batched.boxes2d) == 2
    assert batched.boxes2d[1].shape == (2, 4)
    # per-item boxes record the pad in padded_size (default pad_boxes=False)
    assert batched.boxes2d[1].padded_size is not None


def test_batch_list_intersection():
    f1 = _frame()
    f2 = _frame(seed=1)
    f1.append_labels(Labels(np.array([1.0], np.float32)))
    with pytest.raises(ValueError):
        aloscene.batch_list([f1, f2])
    batched = aloscene.batch_list([f1, f2], intersection=True)
    assert batched.get_child("labels") is None


def test_getitem_batch_and_crop():
    f1 = _frame(32, 40)
    f1.append_boxes2d(BoundingBoxes2D(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                                      "xcyc", False))
    f2 = _frame(32, 40, seed=1)
    f2.append_boxes2d(BoundingBoxes2D(np.array([[0.4, 0.4, 0.2, 0.2]], np.float32),
                                      "xcyc", False))
    batched = aloscene.batch_list([f1, f2])
    b0 = batched[0]
    assert b0.names == ("C", "H", "W")
    assert isinstance(b0.boxes2d, BoundingBoxes2D)
    # H/W slicing crops children (spatial_augmented_tensor.py:628-703)
    crop = f1[:, 8:24, 10:30]
    assert crop.shape == (3, 16, 20)
    assert crop.boxes2d.shape[-1] == 4


def test_temporal_and_batch_dims():
    f = _frame()
    ft = f.temporal()
    assert ft.names == ("T", "C", "H", "W") and ft.shape[0] == 1
    fb = ft.batch()
    assert fb.names == ("B", "T", "C", "H", "W")


def test_arithmetic_keeps_metadata():
    f = _frame(normalization="255")
    g = f / 2.0
    assert isinstance(g, Frame)
    assert g.normalization == "255"
    assert np.allclose(g.as_numpy(), f.as_numpy() / 2)
