"""Tutorial 3 — Frames: the normalization state machine and named dims.

A Frame remembers how its pixel values are encoded ("255", "01",
"minmax_sym", or a named mean/std norm) and converts losslessly between
encodings — models declare the norm they expect and assert it instead of
silently mis-scaling (compare the reference's tutorials/2-frame.py).

Run: python tutorials/03_frames_and_normalization.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu.aloscene import Frame


def main():
    rng = np.random.RandomState(0)
    frame = Frame(rng.uniform(0, 255, (3, 120, 160)).astype(np.float32))
    print("fresh frame:", frame.shape, "names", frame.names,
          "norm =", frame.normalization)

    # --- the normalization state machine --------------------------------
    f01 = frame.norm01()              # [0, 1]
    fsym = f01.norm_minmax_sym()      # [-1, 1] (what RAFT expects)
    fres = fsym.norm_resnet()         # ImageNet mean/std (what DETR expects)
    back = fres.norm255()             # back to [0, 255]
    print("round-trip drift:",
          float(np.abs(back.as_numpy() - frame.as_numpy()).max()))

    # conversions are tracked, not guessed: each Frame knows its state
    for f in (frame, f01, fsym, fres):
        print(f"  normalization={f.normalization!r:14} "
              f"range=[{f.as_numpy().min():7.3f}, {f.as_numpy().max():7.3f}]")

    # norm_as matches another frame's encoding — handy when mixing sources
    mixed = frame.norm_as(fres)
    assert mixed.normalization == fres.normalization

    # --- named dims: temporal and batch ---------------------------------
    # temporal() inserts a leading T dim; batch() a leading B dim. Datasets
    # emit T-stacked sequence frames; batch_list pads a list into a batch.
    seq = frame.temporal()
    print("temporal:", seq.names, seq.shape)
    batched = frame.batch()
    print("batch   :", batched.names, batched.shape)

    # --- padding respects the norm --------------------------------------
    # pad fills with the encoding's "black" (0.0 for 01/255, the mean for
    # mean-std norms) so a padded batch stays valid model input
    padded = fres.pad(offset_y=(0, 0.2), offset_x=(0, 0.25))
    print("padded resnet-norm frame:", padded.shape,
          "| corner value (mean-fill):",
          np.round(padded.as_numpy()[:, -1, -1], 3))


if __name__ == "__main__":
    main()
