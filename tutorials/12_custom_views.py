"""Tutorial 12 — custom views: selecting, excluding, and composing overlays
(reference analog: tutorials/4.2-custom_get_view.py + 4.3-get_view_flow.py).

get_view renders the frame with EVERY renderable child drawn on it. This
tutorial shows how to render only some labels, exclude others, render a
label standalone, and compose several views into one canvas.

Run: python tutorials/12_custom_views.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu.aloscene import (BoundingBoxes2D, Flow, Frame, Labels,
                                     Mask)
from aloception_tpu.aloscene.renderer import Renderer, View


def make_frame(rng):
    frame = Frame(rng.uniform(0, 255, (3, 120, 160)).astype(np.float32))
    frame.append_boxes2d(BoundingBoxes2D(
        np.array([[0.3, 0.4, 0.3, 0.4], [0.7, 0.6, 0.2, 0.3]], np.float32),
        "xcyc", False,
        labels=Labels(np.array([0.0, 1.0]), labels_names=("person", "car"))))
    m = np.zeros((1, 120, 160), np.float32)
    m[0, 40:90, 30:100] = 1.0
    frame.append_segmentation(Mask(m, labels=Labels(np.array([1.0]))))
    # a flow field label: rendered with the Middlebury color wheel
    flow = np.stack(np.meshgrid(np.linspace(-1, 1, 160),
                                np.linspace(-1, 1, 120))).astype(np.float32)
    frame.append_flow(Flow(flow))
    return frame


def main():
    out_dir = "/tmp/alo_tutorial12"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    frame = make_frame(rng)

    # --- everything (default recursive view) -------------------------------
    frame.get_view(title="all labels").save(os.path.join(out_dir, "all.png"))

    # --- exclude children by name (reference: get_view(exclude=[...])) -----
    no_boxes = frame.get_view(exclude=["boxes2d", "flow"],
                              title="mask only")
    no_boxes.save(os.path.join(out_dir, "mask_only.png"))

    # --- render ONE label standalone ---------------------------------------
    # each label type knows how to draw itself; boxes draw onto a pixel
    # canvas (here: the bare frame image), flow renders as its own
    # color-wheel image
    bare = frame.get_view(exclude=["boxes2d", "segmentation", "flow"]).image
    boxes_view = frame.boxes2d.get_view(bare, frame_size=frame.HW)
    flow_view = frame.flow.get_view()
    boxes_view.save(os.path.join(out_dir, "boxes.png"))
    flow_view.save(os.path.join(out_dir, "flow.png"))

    # --- view composition (reference: view.add(view).render()) -------------
    composed = frame.get_view(exclude=["flow"]).add(flow_view)
    composed.save(os.path.join(out_dir, "composed.png"))
    print("composed canvas:", composed.image.shape)

    # --- custom grid layouts via the Renderer ------------------------------
    grid = Renderer.get_grid_view(
        [frame.get_view(title="all"), boxes_view, flow_view,
         frame.hflip().get_view(title="hflip")],
        grid_size=2)   # 2 columns -> 2x2
    View(grid).save(os.path.join(out_dir, "grid2x2.png"))
    print("2x2 grid:", grid.shape, "->", out_dir)


if __name__ == "__main__":
    main()
