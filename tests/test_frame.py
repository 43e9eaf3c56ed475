"""Frame normalization round-trips and label propagation under geometry
(mirrors reference unittest/test_frame.py)."""

import numpy as np
import pytest

import aloception_tpu.aloscene as aloscene
from aloception_tpu.aloscene import (
    Frame, BoundingBoxes2D, Labels, Mask, Flow, Disparity)


def _frame(h=32, w=40, normalization="255", seed=0):
    rng = np.random.RandomState(seed)
    return Frame(rng.uniform(0, 255, (3, h, w)).astype(np.float32),
                 normalization=normalization)


@pytest.mark.parametrize("convert", ["norm01", "norm255", "norm_minmax_sym",
                                     "norm_resnet"])
def test_norm_roundtrip(convert):
    """frame.norm_X().norm255() == frame (frame.py:386-548)."""
    f = _frame()
    converted = getattr(f, convert)()
    back = converted.norm255()
    assert np.abs(back.as_numpy() - f.as_numpy()).max() < 1e-3
    assert back.normalization == "255"


def test_norm_state():
    f = _frame().norm_resnet()
    assert f.normalization == "resnet"
    assert f.mean_std is not None
    f01 = f.norm01()
    assert f01.mean_std is None
    assert f01.normalization == "01"
    assert f01.as_numpy().min() >= -1e-4 and f01.as_numpy().max() <= 1 + 1e-4


def test_norm_as():
    f = _frame()
    target = _frame(seed=1).norm_resnet()
    g = f.norm_as(target)
    assert g.normalization == "resnet"
    assert g.mean_std == target.mean_std


def test_hflip_involution_and_flow_sign():
    f = _frame()
    flow = Flow(np.random.RandomState(0).randn(2, 32, 40).astype(np.float32))
    f.append_flow(flow)
    ff = f.hflip()
    assert np.allclose(ff.as_numpy(), f.as_numpy()[:, :, ::-1])
    # x-flow flipped in position AND negated (flow.py:78)
    assert np.allclose(ff.flow.as_numpy()[0], -flow.as_numpy()[0, :, ::-1])
    assert np.allclose(ff.flow.as_numpy()[1], flow.as_numpy()[1, :, ::-1])
    # involution
    f2 = ff.hflip()
    assert np.allclose(f2.as_numpy(), f.as_numpy(), atol=1e-5)
    assert np.allclose(f2.flow.as_numpy(), flow.as_numpy(), atol=1e-5)


def test_vflip_flow_sign():
    f = _frame()
    flow = Flow(np.random.RandomState(0).randn(2, 32, 40).astype(np.float32))
    f.append_flow(flow)
    fv = f.vflip()
    assert np.allclose(fv.flow.as_numpy()[1], -flow.as_numpy()[1, ::-1])


def test_resize_scales_flow_values():
    f = _frame()
    flow = Flow(np.ones((2, 32, 40), np.float32))
    f.append_flow(flow)
    fr = f.resize((64, 120))
    assert fr.shape == (3, 64, 120)
    assert np.allclose(fr.flow.as_numpy()[0], 3.0, atol=1e-4)  # W ratio
    assert np.allclose(fr.flow.as_numpy()[1], 2.0, atol=1e-4)  # H ratio


def test_resize_disparity_scaling():
    d = Disparity(np.ones((1, 32, 40), np.float32))
    d2 = d.resize((32, 80))
    assert np.allclose(d2.as_numpy(), 2.0, atol=1e-4)


def test_disparity_signed_hflip():
    d = Disparity(np.ones((1, 8, 8), np.float32), camera_side="left").signed()
    assert d.disp_format == "signed"
    assert (d.as_numpy() <= 0).all()
    df = d.hflip()
    assert df.camera_side == "right"
    assert (df.as_numpy() >= 0).all()


def test_pad_norm_fill_values():
    """Padded pixels equal normalized black (frame.py:557-608)."""
    f = _frame().norm_resnet()
    padded = f.pad((0.0, 0.25), (0.0, 0.25))
    assert padded.shape == (3, 40, 50)
    mean, std = f.mean_std
    corner = padded.as_numpy()[:, -1, -1]
    expect = (0.0 - np.array(mean)) / np.array(std)
    assert np.allclose(corner, expect, atol=1e-5)
    # minmax_sym pads with -1
    fm = _frame().norm_minmax_sym().pad((0.0, 0.25), (0.0, 0.25))
    assert np.allclose(fm.as_numpy()[:, -1, -1], -1.0)


def test_pad_multiple():
    f = _frame(30, 41)
    padded = f.pad(multiple=8)
    assert padded.H % 8 == 0 and padded.W % 8 == 0
    assert padded.H == 32 and padded.W == 48


def test_pad_boxes_semantics():
    """Default pad keeps boxes unmoved but records padded_size; fit_to_padded_size
    translates into padded coords (bounding_boxes_2d.py:742-878)."""
    f = _frame(32, 40)
    boxes = BoundingBoxes2D(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
                            "xcyc", False)
    f.append_boxes2d(boxes)
    padded = f.pad((0.0, 1.0), (0.0, 1.0))  # double H and W
    pb = padded.boxes2d
    assert np.allclose(pb.as_numpy(), boxes.as_numpy())  # unmoved
    assert pb.padded_size is not None
    fitted = pb.fit_to_padded_size()
    assert fitted.padded_size is None
    assert np.allclose(fitted.as_numpy(), [[0.25, 0.25, 0.1, 0.1]], atol=1e-5)


def test_crop_propagates_and_filters():
    f = _frame(32, 40)
    boxes = BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.2, 0.2], [0.05, 0.05, 0.05, 0.05]], np.float32),
        "xcyc", False)
    f.append_boxes2d(boxes)
    c = f.crop((0.25, 0.75), (0.25, 0.75))
    assert c.shape == (3, 16, 20)
    assert c.boxes2d.shape[0] == 1  # outside box dropped
    assert np.allclose(c.boxes2d.as_numpy(), [[0.5, 0.5, 0.4, 0.4]], atol=1e-5)


def test_spatial_shift_mean_fill():
    f = _frame()
    s = f.spatial_shift(0.25, 0.0)
    mean = f.as_numpy().mean(axis=(1, 2))
    assert np.allclose(s.as_numpy()[:, 0, 0], mean, atol=1e-4)


def test_as_image():
    f = _frame().norm_resnet()
    img = f.as_image()
    assert img.shape == (32, 40, 3) and img.dtype == np.uint8


def test_mask_iou_and_mask2id():
    m = np.zeros((2, 16, 16), np.float32)
    m[0, :8] = 1
    m[1, 4:12] = 1
    mask = Mask(m, labels=Labels(np.array([7.0, 9.0], np.float32)))
    iou = np.asarray(mask.iou_with(mask))
    assert np.allclose(np.diag(iou), 1.0, atol=1e-5)
    assert 0.3 < iou[0, 1] < 0.4  # 4/12 overlap
    ids = mask.mask2id()
    assert ids.shape == (16, 16)
    assert set(np.unique(ids)) <= {-1, 7, 9}
