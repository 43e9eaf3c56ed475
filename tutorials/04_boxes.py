"""Tutorial 4 — 2D bounding boxes: formats, IoU/GIoU, and geometry that
follows the frame (compare the reference's tutorials/3-boxes.py).

Boxes carry their format (xcyc / xyxy / yxyx) and whether coordinates are
absolute pixels or relative [0, 1] — conversions are explicit methods, and
every geometric op on the parent Frame moves the boxes correctly.

Run: python tutorials/04_boxes.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu.aloscene import BoundingBoxes2D, Frame, Labels


def main():
    rng = np.random.RandomState(0)

    # --- formats & absolute/relative -------------------------------------
    boxes = BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.4, 0.3],           # centered box
                  [0.2, 0.25, 0.2, 0.3]], np.float32),
        boxes_format="xcyc", absolute=False)
    print("xcyc rel:", boxes.as_numpy().round(2).tolist())
    print("xyxy rel:", boxes.xyxy().as_numpy().round(2).tolist())
    print("yxyx abs @240x320:",
          boxes.abs_pos((240, 320)).yxyx().as_numpy().round(1).tolist())
    # round trip is exact
    rt = boxes.abs_pos((240, 320)).xyxy().rel_pos().xcyc()
    print("round-trip drift:",
          float(np.abs(rt.as_numpy() - boxes.as_numpy()).max()))

    # --- IoU / GIoU / NMS -------------------------------------------------
    others = BoundingBoxes2D(
        np.array([[0.55, 0.5, 0.4, 0.3], [0.8, 0.8, 0.1, 0.1]], np.float32),
        boxes_format="xcyc", absolute=False)
    print("iou :", np.asarray(boxes.iou_with(others)).round(3).tolist())
    print("giou:", np.asarray(boxes.giou_with(others)).round(3).tolist())
    keep = boxes.nms(scores=np.array([0.9, 0.8], np.float32),
                     iou_threshold=0.5)
    print("nms keep:", np.asarray(keep).tolist())

    # --- geometry follows the frame ---------------------------------------
    frame = Frame(rng.uniform(0, 255, (3, 240, 320)).astype(np.float32))
    frame.append_boxes2d(BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.4, 0.3]], np.float32),
        boxes_format="xcyc", absolute=False,
        labels=Labels(np.array([0.0]), labels_names=("thing",))))

    flipped = frame.hflip()
    print("hflip moved xc 0.5 ->",
          float(flipped.boxes2d.as_numpy()[0, 0]))

    cropped = frame.crop(H_crop=(0.25, 0.75), W_crop=(0.25, 0.75))
    print("crop recomputed box:",
          cropped.boxes2d.as_numpy().round(3).tolist(),
          "in", cropped.shape)

    # padding: boxes keep their position but remember the padded canvas, so
    # model-relative coordinates can be fixed up (or the padding removed)
    padded = frame.pad(offset_y=(0, 0.25), offset_x=(0, 0.25))
    fitted = padded.boxes2d.fit_to_padded_size()
    print("after pad: stored", padded.boxes2d.as_numpy().round(3).tolist(),
          "fitted", fitted.as_numpy().round(3).tolist())


if __name__ == "__main__":
    main()
