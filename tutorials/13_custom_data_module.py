"""Tutorial 13 — custom data modules: train DETR on a DIFFERENT dataset by
swapping the datasets inside CocoDetection2Detr (reference analog:
tutorials/5.5-custom_datamod.py, which points the module at MOT17).

A data module owns (1) the train/val datasets, (2) the augmentation
pipelines, (3) prepare_batch: list[Frame] -> device arrays + padded targets.
Subclass it and replace any of the three.

Run: python tutorials/13_custom_data_module.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from aloception_tpu.alodataset import CrowdHumanDataset, Split
from aloception_tpu.train import CocoDetection2Detr


class CrowdHuman2Detr(CocoDetection2Detr):
    """Person detection from CrowdHuman through the SAME DETR batch
    contract — only the datasets change; transforms, bucketing and
    prepare_batch are inherited (reference pattern: Mot17DetectionDetr
    overriding setup(), tutorials/5.5)."""

    def __init__(self, sample: bool = False, **kwargs):
        super().__init__(sample=True, **kwargs)   # builds transforms
        # swap the datasets; keep the inherited transform pipelines
        def tfn(make_t):
            return lambda f: make_t(f).norm_resnet()
        self.train_dataset = CrowdHumanDataset(
            split=Split.TRAIN, sample=sample,
            transform_fn=tfn(self.train_transform))
        self.val_dataset = CrowdHumanDataset(
            split=Split.VAL, sample=sample,
            transform_fn=tfn(self.val_transform))
        self.label_names = list(CrowdHumanDataset.CLASSES)


def main():
    # sample=True keeps the tutorial offline (synthetic person scenes)
    dm = CrowdHuman2Detr(sample=True, batch_size=2, size=(120, 160))

    # the loader yields lists of Frames; prepare_batch makes model inputs
    frames = next(iter(dm.train_dataloader()))
    print("frames:", [tuple(f.shape) for f in frames])
    batch = dm.prepare_batch(frames)
    images, mask = batch["inputs"]
    print("images:", images.shape, "mask:", mask.shape)
    print("targets:", {k: v.shape for k, v in batch["targets"].items()})

    # one person class -> a 1-class DETR head; the trainer factory accepts
    # the custom module unchanged
    from aloception_tpu.models.detr import Detr
    from aloception_tpu.train import make_detr_trainer
    model = Detr(num_classes=len(dm.label_names), hidden_dim=64,
                 num_queries=20, nheads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dim_feedforward=128,
                 stage_sizes=(1, 1, 1, 1))
    trainer = make_detr_trainer(model=model, data_module=dm,
                                limit_train_batches=2, limit_val_batches=1)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=1)
    print("trained 2 steps on CrowdHuman:", trainer.last_val_metrics)


if __name__ == "__main__":
    main()
