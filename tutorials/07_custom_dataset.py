"""Tutorial 7 — custom datasets and label-aware augmentation (compare the
reference's tutorials/5.5-custom_datamod.py and alodataset/transforms.py).

A dataset is: subclass BaseDataset, fill `self.items`, implement
`getitem(idx) -> Frame` with labels attached. Everything else — error-retry,
stream/train loaders with worker prefetch, transform hooks — is inherited.
Transforms operate on whole Frames, so boxes/masks/flow move with the pixels
for free.

Run: python tutorials/07_custom_dataset.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu import aloscene
from aloception_tpu.aloscene import BoundingBoxes2D, Frame, Labels
from aloception_tpu.alodataset import (BaseDataset, FromDirectoryDataset,
                                       MergeDataset, transforms as T)


class BlobsDataset(BaseDataset):
    """Synthetic detection dataset: images with one bright square + its box."""

    def __init__(self, n: int = 16, **kwargs):
        super().__init__(name="blobs", dataset_dir=".", **kwargs)
        self.items = list(range(n))           # anything indexable

    def getitem(self, idx: int) -> Frame:
        rng = np.random.RandomState(idx)
        img = rng.uniform(0, 80, (3, 96, 128)).astype(np.float32)
        y, x = rng.randint(10, 60), rng.randint(10, 90)
        img[:, y:y + 28, x:x + 32] = 255.0
        frame = Frame(img)
        boxes = BoundingBoxes2D(
            np.array([[(x + 16) / 128, (y + 14) / 96, 32 / 128, 28 / 96]],
                     np.float32),
            boxes_format="xcyc", absolute=False,
            labels=Labels(np.array([0.0]), labels_names=("blob",)))
        frame.append_boxes2d(boxes)
        return frame


def main():
    # --- label-aware augmentation pipeline --------------------------------
    aug = T.Compose([
        T.RandomHorizontalFlip(p=0.5),
        T.RandomResizeWithAspectRatio(sizes=[64, 80, 96], max_size=160),
        T.ColorJitter(brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1),
    ])
    ds = BlobsDataset(n=16, transform_fn=lambda f: aug(f.norm01()))

    # stream_loader yields single Frames; train_loader yields LISTS of frames
    # (batching happens later via batch_list, so sizes may differ per item)
    for i, frame in enumerate(ds.stream_loader(num_workers=0)):
        if i == 0:
            print("streamed:", frame.shape, frame.normalization,
                  "box:", frame.boxes2d.as_numpy().round(2).tolist())
        if i >= 2:
            break

    batch_frames = next(iter(ds.train_loader(batch_size=4, num_workers=0)))
    batch = aloscene.batch_list(batch_frames)   # pad-to-max + pad mask
    print("train batch:", batch.shape, "mask:", batch.mask.shape)

    # --- composing datasets ------------------------------------------------
    # MergeDataset mixes datasets (weighted); FromDirectoryDataset globs a
    # folder of images — here we write a couple of PNGs and read them back.
    img_dir = "/tmp/alo_tutorial07_imgs"
    os.makedirs(img_dir, exist_ok=True)
    import cv2
    for k in range(3):
        cv2.imwrite(os.path.join(img_dir, f"im{k}.png"),
                    np.random.RandomState(k).randint(
                        0, 255, (48, 64, 3)).astype(np.uint8))
    folder_ds = FromDirectoryDataset(img_dir)
    merged = MergeDataset([BlobsDataset(n=8), folder_ds])
    print("merged length:", len(merged),
          "| item types:", type(merged[0]).__name__, type(merged[-1]).__name__)

    # --- the same_on_sequence contract -------------------------------------
    # one transform instance, applied to a dict of frames, samples its random
    # parameters ONCE — stereo pairs / temporal sequences stay consistent
    pair = {"left": ds.getitem(0).norm01(), "right": ds.getitem(1).norm01()}
    flip = T.RandomHorizontalFlip(p=1.0, same_on_frames=True)
    flipped = flip(pair)
    print("pair flipped together:", sorted(flipped.keys()))


if __name__ == "__main__":
    main()
