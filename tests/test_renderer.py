"""Rendering: views, grid compositing, per-type get_view (mirrors reference
renderer usage in tutorials)."""

import os
import tempfile

import numpy as np

from aloception_tpu.aloscene import (
    Frame, BoundingBoxes2D, Labels, Mask, Flow, Depth)
from aloception_tpu.aloscene.renderer import View, Renderer, render


def _frame():
    rng = np.random.RandomState(0)
    f = Frame(rng.uniform(0, 255, (3, 64, 80)).astype(np.float32))
    f.append_boxes2d(BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.3, 0.3]], np.float32), "xcyc", False,
        labels=Labels(np.array([2.0], np.float32), scores=np.array([0.8]),
                      labels_names=("a", "b", "c"))))
    return f


def test_frame_get_view_draws_boxes():
    v = _frame().get_view()
    assert isinstance(v, View)
    assert v.image.shape == (64, 80, 3)
    assert v.image.min() >= 0 and v.image.max() <= 1


def test_view_save(tmp_path):
    v = _frame().get_view()
    path = v.save(str(tmp_path / "out"))
    assert os.path.exists(path) and path.endswith(".png")
    import cv2
    img = cv2.imread(path)
    assert img.shape == (64, 80, 3)


def test_grid_view_and_record(tmp_path):
    views = [_frame().get_view(), _frame().get_view(),
             Flow(np.random.randn(2, 64, 80).astype(np.float32)).get_view()]
    grid = Renderer.get_grid_view(views)
    assert grid.ndim == 3 and grid.shape[-1] == 3
    r = Renderer()
    mp4 = str(tmp_path / "clip.mp4")
    for _ in range(3):
        r.render(views, record_file=mp4)
    out = r.save()
    assert out == mp4 and os.path.getsize(mp4) > 0


def test_flow_depth_mask_views():
    flow_v = Flow(np.ones((2, 32, 32), np.float32)).get_view()
    assert flow_v.image.shape == (32, 32, 3)
    depth_v = Depth(np.linspace(1, 10, 32 * 32).reshape(1, 32, 32)
                    .astype(np.float32)).get_view()
    assert depth_v.image.shape == (32, 32, 3)
    m = np.zeros((2, 32, 32), np.float32)
    m[0, :16] = 1
    m[1, 16:] = 1
    mask_v = Mask(m, labels=Labels(np.array([1.0, 2.0]))).get_view()
    assert mask_v.image.shape == (32, 32, 3)
    assert mask_v.image.max() > 0
