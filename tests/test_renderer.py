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


def test_grid_title_banners_and_user_defined_layout():
    from aloception_tpu.aloscene.renderer import Renderer, View
    views = [View(np.random.rand(40, 60, 3), title=f"v{i}") for i in range(3)]
    grid = Renderer.get_grid_view(views, add_title=True)
    bh = max(18, 40 // 12)
    assert grid.shape == (2 * (40 + bh), 2 * 60, 3)
    # banner strip exists (dark row at the top of each cell)
    assert grid[0].mean() < 0.5
    plain = Renderer.get_grid_view(views, add_title=False)
    assert plain.shape == (2 * 40, 2 * 60, 3)

    # nested rows define the exact layout
    custom = Renderer.get_user_defined_grid_view(
        [[views[0], views[1]], [views[2]]], add_title=False)
    assert custom.shape == (2 * 40, 2 * 60, 3)
    # bottom-right cell is the black pad
    assert custom[40:, 60:].sum() == 0.0


def test_module_render_persistent_recording(tmp_path):
    import aloception_tpu.aloscene as aloscene
    from aloception_tpu.aloscene.renderer import View
    mp4 = str(tmp_path / "rec.mp4")
    for _ in range(3):  # separate calls must append to ONE file
        aloscene.render([View(np.random.rand(32, 32, 3))], renderer="record",
                        record_file=mp4, fps=5)
    path = aloscene.render_save()
    assert path == mp4
    import os
    assert os.path.getsize(mp4) > 0
