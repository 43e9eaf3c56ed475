"""Per-model trainer factories — the LitDetr / LitDeformableDetr /
LitPanopticDetr / LitRAFT analogs (reference: alonet/detr/train.py:17,
deformable_detr/train.py:11, detr_panoptic/train.py:13, raft/train.py:11).

Each factory wires model + criterion + data module + inference into the
generic Trainer with the reference's default hyperparameters.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp

from ..models.detr import detr_r50, detr_criterion
from ..models.detr import inference as detr_inference
from ..models.deformable_detr import (deformable_detr_r50,
                                      deformable_criterion)
from ..models.deformable_detr import inference as deformable_inference
from ..models.raft import RAFT, raft_small, raft_sequence_loss
from .data_modules import CocoDetection2Detr, Data2RAFT
from .trainer import Trainer


def make_detr_trainer(num_classes: int = 91, background_class: Optional[int] = None,
                      data_module: Optional[CocoDetection2Detr] = None,
                      model=None, dtype=jnp.float32, **trainer_kwargs) -> Trainer:
    """(detr/train.py:17 LitDetr: lr 1e-4 / backbone 1e-5, wd 1e-4,
    grad clip 0.1, accumulate 4 — train.py:79-82, 202-218)."""
    dm = data_module or CocoDetection2Detr(sample=True)
    if model is None:
        n_cls = len(dm.label_names) if dm.label_names else num_classes
        model = detr_r50(num_classes=n_cls, dtype=dtype)
    bg = model.num_classes if background_class is None else background_class
    # padded target capacity can never exceed the query count
    dm.max_targets = min(dm.max_targets, model.num_queries)
    trainer_kwargs.setdefault("accumulate_grad_batches", 4)
    trainer_kwargs.setdefault("project", "detr")
    trainer = Trainer(
        model=model,
        criterion=trainer_kwargs.pop("criterion", detr_criterion),
        prepare_batch=dm.prepare_batch,
        inference_fn=partial(detr_inference, background_class=bg),
        **trainer_kwargs)
    trainer.data_module = dm
    return trainer


def make_deformable_detr_trainer(num_classes: int = 91,
                                 with_box_refine: bool = True,
                                 data_module=None, model=None,
                                 dtype=jnp.float32, **trainer_kwargs) -> Trainer:
    """(deformable_detr/train.py:11 LitDeformableDetr; lr 2e-4 / backbone
    2e-5 per the deformable paper config)."""
    dm = data_module or CocoDetection2Detr(sample=True)
    if model is None:
        n_cls = len(dm.label_names) if dm.label_names else num_classes
        model = deformable_detr_r50(num_classes=n_cls,
                                    with_box_refine=with_box_refine,
                                    dtype=dtype)
    dm.max_targets = min(dm.max_targets, model.num_queries)
    trainer_kwargs.setdefault("lr", 2e-4)
    trainer_kwargs.setdefault("lr_backbone", 2e-5)
    trainer_kwargs.setdefault("project", "deformable-detr")
    trainer = Trainer(
        model=model,
        criterion=trainer_kwargs.pop("criterion", deformable_criterion),
        prepare_batch=dm.prepare_batch,
        inference_fn=deformable_inference,
        **trainer_kwargs)
    trainer.data_module = dm
    return trainer


def _raft_criterion(flow_preds, targets, gamma: float = 0.8):
    return raft_sequence_loss(flow_preds, targets["flow"],
                              valid=targets.get("valid"), gamma=gamma)


def make_raft_trainer(small: bool = False, iters: int = 12,
                      data_module: Optional[Data2RAFT] = None, model=None,
                      num_steps: Optional[int] = None,
                      dtype=jnp.float32, **trainer_kwargs) -> Trainer:
    """(raft/train.py:11 LitRAFT). ``num_steps`` set -> OneCycleLR over
    num_steps + 100 exactly like the reference (train.py:79-86: pct_start
    0.05, linear anneal, scheduler only when max_steps is given)."""
    dm = data_module or Data2RAFT(sample=True)
    if model is None:
        model = raft_small(dtype=dtype) if small else RAFT(dtype=dtype)
    trainer_kwargs.setdefault("lr", 4e-4)
    trainer_kwargs.setdefault("grad_clip", 1.0)
    trainer_kwargs.setdefault("project", "raft")
    if num_steps is not None and "optimizer" not in trainer_kwargs:
        from .state import make_optimizer, onecycle_schedule
        lr = trainer_kwargs["lr"]
        trainer_kwargs["optimizer"] = make_optimizer(
            lr=lr, lr_backbone=lr, weight_decay=1e-4,
            grad_clip=trainer_kwargs["grad_clip"],
            accumulate_steps=trainer_kwargs.get("accumulate_grad_batches", 1),
            schedule=onecycle_schedule(lr, num_steps + 100))
    trainer = Trainer(
        model=model,
        criterion=trainer_kwargs.pop("criterion", _raft_criterion),
        prepare_batch=dm.prepare_batch,
        inference_fn=None,
        **trainer_kwargs)
    trainer.data_module = dm
    return trainer


def make_panoptic_trainer(num_classes: int = 250, data_module=None,
                          detector=None, freeze_detector: bool = True,
                          dtype=jnp.float32, **trainer_kwargs):
    """(detr_panoptic/train.py:13 LitPanopticDetr): a PanopticHead wrapped
    around a (by default frozen) DETR detector; only the head trains.

    The returned Trainer's model is a composite flax-less callable pair; the
    criterion composes the detection losses with DICE+focal mask losses.
    """
    from ..models.panoptic import (DetrPanoptic, panoptic_criterion,
                                   inference_with_masks)
    from .data_modules import CocoDetection2Detr

    dm = data_module or CocoDetection2Detr(sample=True, return_masks=True)
    n_cls = len(dm.label_names) if dm.label_names else num_classes

    model = DetrPanoptic(detector=detector, num_classes=n_cls,
                         freeze_detector=freeze_detector, dtype=dtype)
    n_queries = detector.num_queries if detector is not None else 100
    dm.max_targets = min(dm.max_targets, n_queries)
    trainer_kwargs.setdefault("project", "panoptic")
    if freeze_detector and "optimizer" not in trainer_kwargs:
        from .state import make_optimizer
        trainer_kwargs["optimizer"] = make_optimizer(
            lr=trainer_kwargs.get("lr", 1e-4),
            lr_backbone=trainer_kwargs.get("lr_backbone", 1e-5),
            grad_clip=trainer_kwargs.get("grad_clip", 0.1),
            accumulate_steps=trainer_kwargs.get("accumulate_grad_batches", 1),
            freeze_prefixes=("detector",))
    # inference activation must follow the DETECTOR: softmax detectors
    # (DETR) have a background column at n_cls; sigmoid/focal detectors
    # (Deformable) have neither — mirrors eval_on_coco.py's act selection
    act = getattr(detector, "activation_fn", "softmax") \
        if detector is not None else "softmax"
    trainer = Trainer(
        model=model,
        criterion=trainer_kwargs.pop("criterion", panoptic_criterion),
        prepare_batch=_make_panoptic_prepare(dm),
        inference_fn=partial(
            inference_with_masks, activation_fn=act,
            background_class=n_cls if act == "softmax" else None),
        **trainer_kwargs)
    trainer.data_module = dm
    return trainer


def _make_panoptic_prepare(dm):
    """Extend the DETR batch with padded instance masks."""
    import numpy as _np

    def prepare(frames_list, training=True):
        out = dm.prepare_batch(frames_list, training=training)
        frames = out["frames"]
        B = out["inputs"][0].shape[0]
        H, W = out["inputs"][0].shape[1:3]
        Nt = out["targets"]["boxes"].shape[1]
        masks = _np.zeros((B, Nt, H, W), _np.float32)
        seg_slot = frames.get_child("segmentation")
        seg_list = seg_slot if isinstance(seg_slot, list) else [seg_slot] * B
        for b, seg in enumerate(seg_list[:B]):
            if seg is None or isinstance(seg, dict):
                continue
            m = _np.asarray(seg.as_numpy())
            n = min(m.shape[0], Nt)
            if m.shape[-2:] != (H, W):
                import cv2
                m = _np.stack([cv2.resize(mm, (W, H),
                                          interpolation=cv2.INTER_NEAREST)
                               for mm in m[:n]]) if n else m[:n]
            masks[b, :n] = m[:n]
        out["targets"]["masks"] = masks
        return out
    return prepare
