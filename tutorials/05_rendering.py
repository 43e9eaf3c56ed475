"""Tutorial 5 — rendering: Views, grid compositing, and label overlays
(compare the reference's tutorials/4.0-rendering.py … 4.3-get_view_flow.py).

Every aloscene type knows how to draw itself: frame.get_view() recursively
composites the frame and all attached labels (boxes, masks, flow as a color
wheel, depth as a colormap). Views combine into grids, display through cv2 /
matplotlib, and record straight to mp4.

Run: python tutorials/05_rendering.py   (writes /tmp/alo_tutorial05/*.png|mp4)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu.aloscene import (BoundingBoxes2D, Flow, Frame, Labels,
                                     Mask)
from aloception_tpu.aloscene.renderer import Renderer


def make_frame(rng, t=0.0):
    frame = Frame(rng.uniform(0, 255, (3, 120, 160)).astype(np.float32))
    frame.append_boxes2d(BoundingBoxes2D(
        np.array([[0.3 + 0.05 * t, 0.4, 0.25, 0.3]], np.float32),
        boxes_format="xcyc", absolute=False,
        labels=Labels(np.array([0.0]), labels_names=("player",))))
    m = np.zeros((1, 120, 160), np.float32)
    m[0, 60:100, 20:80] = 1.0
    frame.append_segmentation(Mask(m, labels=Labels(np.array([1.0]))))
    return frame


def main():
    out_dir = "/tmp/alo_tutorial05"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)

    # --- a single view: frame + recursive label overlays ------------------
    frame = make_frame(rng)
    view = frame.get_view()            # boxes + mask drawn automatically
    view.save(os.path.join(out_dir, "frame.png"))
    print("frame view:", view.image.shape, "->", out_dir + "/frame.png")

    # --- label types render standalone too --------------------------------
    flow = Flow(np.stack(np.meshgrid(
        np.linspace(-1, 1, 160), np.linspace(-1, 1, 120))).astype(np.float32))
    flow_view = flow.get_view()        # Middlebury color wheel
    flow_view.save(os.path.join(out_dir, "flow.png"))

    # --- grids: compose views side by side ---------------------------------
    grid = Renderer.get_grid_view([frame.get_view(), flow_view,
                                   frame.hflip().get_view()])
    from aloception_tpu.aloscene.renderer import View
    View(grid).save(os.path.join(out_dir, "grid.png"))
    print("grid:", grid.shape)

    # --- streaming/recording: Renderer.render(..., record_file=...) --------
    r = Renderer()
    mp4 = os.path.join(out_dir, "clip.mp4")
    for t in range(8):                  # 8 synthetic 'video' frames
        r.render([make_frame(rng, t).get_view()], renderer="record",
                 record_file=mp4, fps=4)
    r.save()
    print("recorded:", mp4, os.path.getsize(mp4), "bytes")


if __name__ == "__main__":
    main()
