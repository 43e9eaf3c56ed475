"""Tutorial 1 — augmented arrays: labels that transform with the data
(the aloscene core; compare with the reference's tutorials/).

Run: python tutorials/01_augmented_arrays.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import aloception_tpu.aloscene as aloscene
from aloception_tpu.aloscene import (BoundingBoxes2D, Flow, Frame, Labels,
                                     Mask)


def main():
    # a Frame is an image + a tree of labels that move together
    rng = np.random.RandomState(0)
    frame = Frame(rng.uniform(0, 255, (3, 240, 320)).astype(np.float32))
    frame.append_boxes2d(BoundingBoxes2D(
        np.array([[0.4, 0.5, 0.25, 0.4], [0.75, 0.3, 0.15, 0.2]], np.float32),
        boxes_format="xcyc", absolute=False,
        labels=Labels(np.array([0.0, 1.0]), labels_names=("person", "car"))))
    frame.append_flow(Flow(rng.randn(2, 240, 320).astype(np.float32)))

    # every geometric op propagates: flip negates x-flow, moves the boxes
    flipped = frame.hflip()
    print("boxes before:", np.asarray(frame.boxes2d.array)[:, 0])
    print("boxes after hflip:", np.asarray(flipped.boxes2d.array)[:, 0])

    # normalization is a tracked state machine
    resnet = frame.norm_resnet()
    print("normalization:", frame.normalization, "->", resnet.normalization)

    # crop in relative coordinates; out-of-crop boxes are dropped
    crop = frame.crop((0.25, 0.95), (0.1, 0.9))
    print("boxes kept after crop:", crop.boxes2d.shape[0])

    # batch_list pads to the max size and attaches a padded-area mask
    other = Frame(rng.uniform(0, 255, (3, 200, 280)).astype(np.float32))
    batch = aloscene.batch_list([frame, other], intersection=True)
    print("batched:", batch.shape, "padded px:",
          int(batch.mask.as_numpy().sum()))

    # frames are pytrees: they flow through jax transparently
    import jax
    on_device = jax.device_put(frame)
    print("on device:", type(on_device).__name__,
          type(on_device.array).__name__)

    # render the annotated frame to a PNG
    path = frame.get_view().save("/tmp/tutorial_frame.png")
    print("annotated view saved to", path)


if __name__ == "__main__":
    main()
