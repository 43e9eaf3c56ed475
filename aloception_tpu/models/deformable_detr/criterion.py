"""Deformable-DETR criterion + focal matcher
(reference: alonet/deformable_detr/criterion.py:10-41, matcher.py:42).

Sigmoid focal classification loss over all queries (no background class;
unmatched queries train toward all-zero logits), same L1/GIoU box losses as
DETR; the matcher's class cost uses the focal pos/neg terms.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops
from ...ops.hungarian import hungarian_rect
from ..detr.criterion import loss_boxes


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25,
                       gamma: float = 2.0):
    """(criterion.py:10-41) element-wise focal BCE."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable BCE with logits."""
    return jnp.maximum(logits, 0) - logits * labels \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_cost_matrix(pred_logits, pred_boxes, tgt_labels, tgt_boxes,
                      tgt_valid, cost_class: float = 1.0,
                      cost_boxes: float = 5.0, cost_giou: float = 2.0,
                      alpha: float = 0.25, gamma: float = 2.0):
    """(matcher.py:42 DeformableDetrHungarianMatcher)"""
    prob = jax.nn.sigmoid(pred_logits)                     # (Nq, C)
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log1p(-prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    c_class = pos[:, tgt_labels] - neg[:, tgt_labels]      # (Nq, Nt)
    c_l1 = jnp.abs(pred_boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)
    c_giou = -box_ops.giou_xyxy(box_ops.xcyc_to_xyxy(pred_boxes),
                                box_ops.xcyc_to_xyxy(tgt_boxes))
    cost = cost_class * c_class + cost_boxes * c_l1 + cost_giou * c_giou
    return jnp.where(tgt_valid[None, :], cost, 0.0)


def focal_hungarian_match(m_outputs: Dict, targets: Dict, **cost_kwargs):
    def per_image(logits, boxes, labels, tboxes, valid):
        c = focal_cost_matrix(logits, boxes, labels, tboxes, valid,
                              **cost_kwargs)
        return hungarian_rect(c, valid.sum())

    matched = jax.vmap(per_image)(
        m_outputs["pred_logits"], m_outputs["pred_boxes"],
        targets["labels"], targets["boxes"], targets["valid"])
    return matched, targets["valid"]


def loss_labels_focal(pred_logits, targets, matched, num_boxes,
                      alpha: float = 0.25, gamma: float = 2.0):
    """Focal classification: matched queries get a one-hot target, all others
    all-zeros (criterion.py loss_labels with sigmoid activation)."""
    B, Nq, C = pred_logits.shape
    b_idx = jnp.arange(B)[:, None]
    q_idx = jnp.where(targets["valid"], matched, Nq)
    onehot = jnp.zeros((B, Nq, C), pred_logits.dtype)
    cls = jax.nn.one_hot(targets["labels"], C, dtype=pred_logits.dtype)
    onehot = onehot.at[b_idx, q_idx].set(cls, mode="drop")
    loss = sigmoid_focal_loss(pred_logits, onehot, alpha, gamma)
    return loss.mean(1).sum() * Nq / jnp.maximum(num_boxes, 1.0) / C


def deformable_criterion(m_outputs: Dict, targets: Dict,
                         loss_ce_weight: float = 2.0,
                         loss_boxes_weight: float = 5.0,
                         loss_giou_weight: float = 2.0,
                         alpha: float = 0.25, gamma: float = 2.0,
                         aux_loss: bool = True,
                         **unused) -> Tuple[jnp.ndarray, Dict]:
    """(criterion.py:10 DeformableCriterion forward; ce weight 2 per the
    reference deformable config)."""
    num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)

    def single(out):
        matched, _ = focal_hungarian_match(out, targets, alpha=alpha,
                                           gamma=gamma)
        l_ce = loss_labels_focal(out["pred_logits"], targets, matched,
                                 num_boxes, alpha, gamma)
        l_l1, l_giou = loss_boxes(out["pred_boxes"], targets, matched,
                                  num_boxes)
        total = (loss_ce_weight * l_ce + loss_boxes_weight * l_l1
                 + loss_giou_weight * l_giou)
        return total, {"loss_ce": l_ce, "loss_bbox": l_l1, "loss_giou": l_giou}

    total, metrics = single(m_outputs)
    if aux_loss and "aux_outputs" in m_outputs:
        for i, aux in enumerate(m_outputs["aux_outputs"]):
            t_i, m_i = single(aux)
            total = total + t_i
            metrics.update({f"{k}_{i}": v for k, v in m_i.items()})
    metrics["loss_total"] = total
    return total, metrics
