"""Tutorial 11 — sequences: the temporal axis T and per-frame labels
(reference analog: tutorials/4.1-sequence.py; temporal dims in
aloscene/spatial.py).

A video clip is a SpatialAugmentedArray whose layout carries a named "T"
axis. Frames stack into sequences with aloscene.temporal_list; every
geometric op applies to the whole clip, and indexing the T axis yields the
per-timestep frame with its own labels.

Run: python tutorials/11_sequences.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import aloception_tpu.aloscene as aloscene
from aloception_tpu.aloscene import BoundingBoxes2D, Frame, Labels


def make_frame(rng, t):
    """A synthetic 'video' frame: one box drifting right over time."""
    img = rng.uniform(0, 255, (3, 120, 160)).astype(np.float32)
    x = 0.2 + 0.1 * t
    frame = Frame(img)
    frame.append_boxes2d(BoundingBoxes2D(
        np.array([[x, 0.5, 0.2, 0.3]], np.float32), "xcyc", False,
        labels=Labels(np.array([0.0]), labels_names=("car",))))
    return frame


def main():
    rng = np.random.RandomState(0)

    # --- build a T=4 sequence ---------------------------------------------
    clip = aloscene.temporal_list([make_frame(rng, t) for t in range(4)])
    print("clip names:", clip.names, "shape:", clip.shape)   # (T, C, H, W)
    assert clip.names[0] == "T" and clip.shape[0] == 4

    # labels ride along PER TIMESTEP: boxes2d is a list over T (box counts
    # may differ between frames, so the T axis keeps children ragged)
    print("boxes per t:", [b.shape for b in clip.boxes2d])   # 4 x (1, 4)

    # --- whole-clip geometry -----------------------------------------------
    # ops apply across T; hflip mirrors every timestep AND its boxes
    flipped = clip.hflip()
    x_t0 = float(np.asarray(clip.boxes2d[0].array)[0, 0])
    x_t0_f = float(np.asarray(flipped.boxes2d[0].array)[0, 0])
    print(f"t=0 box x: {x_t0:.2f} -> {x_t0_f:.2f} after clip hflip")
    assert abs((1 - x_t0) - x_t0_f) < 1e-5

    # a resize changes every timestep consistently
    small = clip.resize((60, 80))
    print("resized:", small.shape)

    # --- per-timestep access ------------------------------------------------
    # the drifting box, one entry per timestep
    xs = [float(np.asarray(clip.boxes2d[t].array)[0, 0]) for t in range(4)]
    print("box drift over time:", [f"{x:.2f}" for x in xs])

    # --- batches of sequences ------------------------------------------------
    # batch_list on temporal frames -> (B, T, C, H, W), the layout the
    # temporal datasets (MOT17, Waymo sequence_size>1) emit
    clips = [aloscene.temporal_list([make_frame(rng, t) for t in range(4)])
             for _ in range(2)]
    batch = aloscene.batch_list(clips)
    print("batched clips:", batch.names, batch.shape)
    assert batch.names[:2] == ("B", "T")


if __name__ == "__main__":
    main()
