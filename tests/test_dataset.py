"""Dataset + transform library tests (mirrors reference
unittest/test_transformation.py + dataset sample tests)."""

import numpy as np
import pytest

import aloception_tpu.aloscene as aloscene
from aloception_tpu.aloscene import Frame, BoundingBoxes2D
from aloception_tpu.alodataset import (
    CocoBaseDataset, FlyingChairs2Dataset, SintelFlowDataset, MergeDataset,
    Split, transforms as T)


def test_coco_sample_items():
    ds = CocoBaseDataset(sample=True, return_masks=True)
    assert len(ds) > 0
    frame = ds[0]
    assert isinstance(frame, Frame)
    assert frame.normalization == "255"
    boxes = frame.boxes2d
    assert boxes.boxes_format == "xcyc" and not boxes.absolute
    assert boxes.labels.labels_names is not None
    seg = frame.segmentation
    assert seg.shape[0] == boxes.shape[0]


def test_stream_and_train_loader():
    ds = CocoBaseDataset(sample=True)
    seen = 0
    for f in ds.stream_loader(num_workers=2):
        assert isinstance(f, Frame)
        seen += 1
    assert seen == len(ds)
    loader = ds.train_loader(batch_size=4, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert all(len(b) == 4 for b in batches)
    batched = aloscene.batch_list(batches[0])
    assert batched.names == ("B", "C", "H", "W")
    assert batched.mask is not None
    # second epoch reshuffles
    batches2 = list(loader)
    assert len(batches2) == len(batches)


def test_retry_on_invalid_sample():
    from aloception_tpu.aloscene import InvalidSampleError

    class Flaky(CocoBaseDataset):
        def getitem(self, idx):
            if idx == 0:
                raise InvalidSampleError("corrupt")
            return super().getitem(idx)

    ds = Flaky(sample=True)
    f = ds[0]  # retries at idx+retry_offset
    assert isinstance(f, Frame)


def test_flying_chairs_sample_temporal_pair():
    ds = FlyingChairs2Dataset(sample=True)
    frames = ds[0]
    assert frames.names == ("T", "C", "H", "W")
    assert frames.shape[0] == 2
    flow_slot = frames.flow
    assert isinstance(flow_slot, list) and len(flow_slot) == 2
    assert flow_slot[0] is not None and flow_slot[1] is None
    f0 = frames[0]
    assert isinstance(f0.flow, dict)  # named set {"flow_forward": Flow}


def test_sintel_sample():
    ds = SintelFlowDataset(sample=True, sequence_size=2)
    frames = ds[0]
    assert frames.shape[0] == 2


def test_merge_dataset():
    d1 = CocoBaseDataset(sample=True)
    d2 = CocoBaseDataset(sample=True)
    m = MergeDataset([d1, d2], weights=[1, 2])
    assert len(m) == len(d1) + 2 * len(d2)
    assert isinstance(m[0], Frame)


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------
def _frame_with_boxes(h=64, w=80, seed=0):
    rng = np.random.RandomState(seed)
    f = Frame(rng.uniform(0, 255, (3, h, w)).astype(np.float32))
    f.append_boxes2d(BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.2, 0.2], [0.3, 0.6, 0.1, 0.2]], np.float32),
        "xcyc", False))
    return f


def test_compose_and_resize():
    t = T.Compose([T.Resize((32, 40)), T.RandomHorizontalFlip(p=1.0)])
    out = t(_frame_with_boxes())
    assert out.HW == (32, 40)
    assert np.allclose(np.asarray(out.boxes2d.array)[0, 0], 0.5, atol=1e-5)
    assert np.allclose(np.asarray(out.boxes2d.array)[1, 0], 0.7, atol=1e-5)


def test_random_select_deterministic_branches():
    t = T.RandomSelect(T.Resize((16, 16)), T.Resize((32, 32)), p=1.0)
    out = t(_frame_with_boxes())
    assert out.HW == (16, 16)
    t2 = T.RandomSelect(T.Resize((16, 16)), T.Resize((32, 32)), p=0.0)
    assert t2(_frame_with_boxes()).HW == (32, 32)


def test_random_size_crop_bounds():
    t = T.RandomSizeCrop(20, 40)
    for _ in range(5):
        out = t(_frame_with_boxes())
        assert 20 <= out.H <= 40 and 20 <= out.W <= 40


def test_resize_aspect_ratio():
    t = T.RandomResizeWithAspectRatio([48], max_size=70)
    out = t(_frame_with_boxes(64, 100))
    assert min(out.HW) <= 48 and max(out.HW) <= 70


def test_same_on_frames_shares_params():
    np.random.seed(0)
    t = T.RandomSizeCrop(20, 40, same_on_frames=True, same_on_sequence=True)
    f1 = _frame_with_boxes(seed=1)
    f2 = _frame_with_boxes(seed=2)
    out = t({"a": f1, "b": f2})
    assert out["a"].HW == out["b"].HW


def test_same_on_sequence_false_varies():
    ds = FlyingChairs2Dataset(sample=True)
    frames = ds[0]
    t = T.RealisticNoise(same_on_sequence=False)
    out = t(frames)
    assert out.shape == frames.shape


def test_color_transforms_preserve_norm():
    f = _frame_with_boxes().norm01()
    for t in [T.GrayScale(), T.ColorJitter(), T.CustomRandomColoring(),
              T.RealisticNoise(), T.RandomFocusBlur(), T.RandomFocusBlurV2(),
              T.RandomFocusBlurV3(), T.RandomCornersMask()]:
        out = t(f)
        assert out.shape == f.shape, type(t).__name__
        assert out.normalization == "01", type(t).__name__
        a = np.asarray(out.as_numpy())
        assert a.min() >= -1e-4 and a.max() <= 1 + 1e-4, type(t).__name__


def test_spatial_shift_transform():
    t = T.SpatialShift((0.1, 0.2))
    out = t(_frame_with_boxes())
    assert out.shape == (3, 64, 80)


def test_ir_augmentation():
    out = T.IRAugmentation()(_frame_with_boxes())
    assert out.shape == (3, 64, 80)
    arr = np.asarray(out.norm01().as_numpy())
    # grayscale: channels equalish before noise; at least shape/norm survive
    assert arr.shape[0] == 3
