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
        criterion=detr_criterion,
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
        criterion=deformable_criterion,
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
                      dtype=jnp.float32, **trainer_kwargs) -> Trainer:
    """(raft/train.py:11 LitRAFT; OneCycleLR in the reference — constant lr
    with clipping here, schedule pluggable via make_optimizer)."""
    dm = data_module or Data2RAFT(sample=True)
    if model is None:
        model = raft_small(dtype=dtype) if small else RAFT(dtype=dtype)
    trainer_kwargs.setdefault("lr", 4e-4)
    trainer_kwargs.setdefault("grad_clip", 1.0)
    trainer_kwargs.setdefault("project", "raft")
    trainer = Trainer(
        model=model,
        criterion=_raft_criterion,
        prepare_batch=dm.prepare_batch,
        inference_fn=None,
        **trainer_kwargs)
    trainer.data_module = dm
    return trainer
