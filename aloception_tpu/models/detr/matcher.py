"""DETR Hungarian matcher, fully on device
(reference: alonet/detr/matcher.py:15 DetrHungarianMatcher).

Cost = cost_class * (-softmax prob of the target class)
     + cost_boxes * L1(xcyc) + cost_giou * (-GIoU)          (matcher.py:89-120)

The reference syncs every cost matrix to the CPU for scipy
(matcher.py:121-129); here targets are fixed-capacity padded arrays and the
assignment solves on-chip (ops/hungarian.py), so matching jits into the
train step with zero host round-trips.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops
from ...ops.hungarian import hungarian_rect


def cost_matrix(pred_logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid,
                cost_class: float = 1.0, cost_boxes: float = 5.0,
                cost_giou: float = 2.0, softmax_logits: bool = True):
    """Per-image DETR matching cost (Nq, Nt). Invalid targets masked later."""
    prob = jax.nn.softmax(pred_logits, axis=-1) if softmax_logits else pred_logits
    c_class = -prob[:, tgt_labels]                                   # (Nq, Nt)
    c_l1 = jnp.abs(pred_boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)
    c_giou = -box_ops.giou_xyxy(box_ops.xcyc_to_xyxy(pred_boxes),
                                box_ops.xcyc_to_xyxy(tgt_boxes))
    cost = cost_class * c_class + cost_boxes * c_l1 + cost_giou * c_giou
    return jnp.where(tgt_valid[None, :], cost, 0.0)


def hungarian_match(m_outputs: Dict, targets: Dict,
                    cost_class: float = 1.0, cost_boxes: float = 5.0,
                    cost_giou: float = 2.0, softmax_logits: bool = True):
    """Batched matcher.

    targets: {"boxes": (B, Nt, 4) xcyc rel, "labels": (B, Nt) int32,
              "valid": (B, Nt) bool}
    Returns (matched_query (B, Nt) int32, valid (B, Nt) bool): for each valid
    target, the index of its assigned query.
    """
    def per_image(logits, boxes, labels, tboxes, valid):
        c = cost_matrix(logits, boxes, labels, tboxes, valid,
                        cost_class, cost_boxes, cost_giou, softmax_logits)
        return hungarian_rect(c, valid.sum())

    matched = jax.vmap(per_image)(
        m_outputs["pred_logits"], m_outputs["pred_boxes"],
        targets["labels"], targets["boxes"], targets["valid"])
    return matched, targets["valid"]
