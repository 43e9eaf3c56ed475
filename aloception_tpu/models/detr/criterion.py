"""DETR set criterion (reference: alonet/detr/criterion.py:14 DetrCriterion).

Losses (criterion.py:37-149): cross-entropy over (num_classes+1) with
``eos_coef`` down-weighting the background class, L1 + GIoU box losses on
matched pairs, all duplicated over the auxiliary decoder layers. Loss weights
(train.py defaults): ce 1, l1 5 ("loss_boxes"), giou 2.

Everything is static-shape: targets are fixed-capacity padded arrays; the
scatter of matched targets onto the (B, Nq) class map replaces the
reference's python indexing, so the whole criterion jits into the train step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops
from .matcher import hungarian_match


def loss_labels(pred_logits, targets, matched, num_boxes,
                eos_coef: float = 0.1, background_class: int = None):
    """Weighted CE (criterion.py:61): background queries get weight eos_coef."""
    B, Nq, C = pred_logits.shape
    background_class = C - 1 if background_class is None else background_class
    target_classes = jnp.full((B, Nq), background_class, jnp.int32)
    # scatter matched target labels onto their assigned queries; invalid
    # targets get an out-of-range index and are dropped by the scatter
    b_idx = jnp.arange(B)[:, None]
    q_idx = jnp.where(targets["valid"], matched, Nq)
    target_classes = target_classes.at[b_idx, q_idx].set(
        targets["labels"], mode="drop")

    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
    w = jnp.where(target_classes == background_class, eos_coef, 1.0)
    loss = (ce * w).sum() / w.sum()
    return loss, target_classes


def loss_boxes(pred_boxes, targets, matched, num_boxes):
    """L1 + GIoU on matched pairs, normalized by num_boxes (criterion.py:105)."""
    b_idx = jnp.arange(pred_boxes.shape[0])[:, None]
    safe_q = jnp.where(targets["valid"], matched, 0)
    src = pred_boxes[b_idx, safe_q]                      # (B, Nt, 4)
    valid = targets["valid"].astype(pred_boxes.dtype)

    l1 = jnp.abs(src - targets["boxes"]).sum(-1)
    loss_l1 = (l1 * valid).sum() / num_boxes

    giou = box_ops.giou_xyxy_paired(
        box_ops.xcyc_to_xyxy(src), box_ops.xcyc_to_xyxy(targets["boxes"]))
    loss_giou = ((1.0 - giou) * valid).sum() / num_boxes
    return loss_l1, loss_giou


def detr_criterion(m_outputs: Dict, targets: Dict,
                   loss_ce_weight: float = 1.0, loss_boxes_weight: float = 5.0,
                   loss_giou_weight: float = 2.0, eos_coef: float = 0.1,
                   matcher=hungarian_match, aux_loss: bool = True,
                   background_class: int = None) -> Tuple[jnp.ndarray, Dict]:
    """Total DETR loss + metrics dict (criterion.py:14-149 forward).

    ``num_boxes`` is the global count of valid targets — under data
    parallelism wrap this with a psum (see parallel/), mirroring the
    all_reduce in the reference (criterion.py: get_num_boxes).
    """
    num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)

    def single(out):
        matched, _ = matcher(out, targets)
        l_ce, tgt_classes = loss_labels(
            out["pred_logits"], targets, matched, num_boxes, eos_coef,
            background_class)
        l_l1, l_giou = loss_boxes(out["pred_boxes"], targets, matched, num_boxes)
        total = (loss_ce_weight * l_ce + loss_boxes_weight * l_l1
                 + loss_giou_weight * l_giou)
        return total, {"loss_ce": l_ce, "loss_bbox": l_l1, "loss_giou": l_giou}

    total, metrics = single(m_outputs)
    if aux_loss and "aux_outputs" in m_outputs:
        for i, aux in enumerate(m_outputs["aux_outputs"]):
            t_i, m_i = single(aux)
            total = total + t_i
            metrics.update({f"{k}_{i}": v for k, v in m_i.items()})
    # cardinality error diagnostic (criterion.py: loss_cardinality)
    pred_cls = jnp.argmax(m_outputs["pred_logits"], axis=-1)
    bg = m_outputs["pred_logits"].shape[-1] - 1 if background_class is None \
        else background_class
    card_err = jnp.abs((pred_cls != bg).sum(-1).astype(jnp.float32)
                       - targets["valid"].sum(-1).astype(jnp.float32)).mean()
    metrics["cardinality_error"] = card_err
    metrics["loss_total"] = total
    return total, metrics


def targets_from_frames(frames, max_targets: int = 100):
    """Host-side: aloscene batched frames -> fixed-capacity padded target
    arrays for the jit criterion. Boxes become xcyc relative."""
    import numpy as np

    boxes_list = frames.boxes2d if isinstance(frames.boxes2d, list) \
        else [frames.boxes2d]
    B = len(boxes_list)
    boxes = np.zeros((B, max_targets, 4), np.float32)
    labels = np.zeros((B, max_targets), np.int32)
    valid = np.zeros((B, max_targets), bool)
    for b, bx in enumerate(boxes_list):
        n = min(bx.shape[0], max_targets)
        if n == 0:
            continue
        rel = bx.rel_pos().xcyc() if bx.absolute else bx.xcyc()
        boxes[b, :n] = np.asarray(rel.as_numpy())[:n]
        lab = rel.get_child("labels")
        if lab is not None and not isinstance(lab, dict):
            labels[b, :n] = np.asarray(lab.as_numpy())[:n].astype(np.int32)
        valid[b, :n] = True
    return {"boxes": boxes, "labels": labels, "valid": valid}
