"""Panoptic criterion: detection losses + DICE + focal mask losses
(reference: alonet/detr_panoptic/criterion.py:78 PanopticCriterion;
dice_loss:16, sigmoid_focal_loss:42)."""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..detr.criterion import detr_criterion
from ..detr.matcher import hungarian_match
from ..deformable_detr.criterion import (deformable_criterion,
                                         optax_sigmoid_ce)


def dice_loss(pred_logits, targets, valid, num_boxes):
    """(criterion.py:16) soft dice over flattened masks."""
    p = jax.nn.sigmoid(pred_logits)
    p = p.reshape(p.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    num = 2 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    loss = 1 - (num + 1) / (den + 1)
    return (loss * valid).sum() / num_boxes


def focal_mask_loss(pred_logits, targets, valid, num_boxes,
                    alpha: float = 0.25, gamma: float = 2.0):
    """(criterion.py:42) pixel-wise sigmoid focal, mean over pixels."""
    p = jax.nn.sigmoid(pred_logits)
    ce = optax_sigmoid_ce(pred_logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = (alpha_t * loss).mean(axis=(-2, -1))
    return (loss * valid).sum() / num_boxes


def loss_masks(pred_masks, target_masks, targets, matched, num_boxes):
    """Gather matched query masks, resize targets to mask resolution, apply
    DICE + focal (criterion.py loss_masks)."""
    B, Nq, Hm, Wm = pred_masks.shape
    b_idx = jnp.arange(B)[:, None]
    safe_q = jnp.where(targets["valid"], matched, 0)
    src = pred_masks[b_idx, safe_q]                    # (B, Nt, Hm, Wm)

    tm = jax.image.resize(
        target_masks, (B, target_masks.shape[1], Hm, Wm), method="nearest")
    valid = targets["valid"].astype(pred_masks.dtype)

    src_f = src.reshape(-1, Hm, Wm)
    tm_f = tm.reshape(-1, Hm, Wm)
    v_f = valid.reshape(-1)
    l_dice = dice_loss(src_f, tm_f, v_f, num_boxes)
    l_focal = focal_mask_loss(src_f, tm_f, v_f, num_boxes)
    return l_dice, l_focal


def panoptic_criterion(m_outputs: Dict, targets: Dict,
                       base_criterion: Callable = detr_criterion,
                       matcher: Callable = hungarian_match,
                       loss_dice_weight: float = 1.0,
                       loss_focal_weight: float = 1.0,
                       **base_kwargs) -> Tuple[jnp.ndarray, Dict]:
    """Detection criterion + mask losses on the final layer's matching.

    targets additionally carries "masks": (B, Nt, H, W) float instance masks
    aligned with boxes/labels/valid.
    """
    total, metrics = base_criterion(m_outputs, targets, **base_kwargs)
    num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)
    matched, _ = matcher(m_outputs, targets)
    l_dice, l_focal = loss_masks(m_outputs["pred_masks"], targets["masks"],
                                 targets, matched, num_boxes)
    total = total + loss_dice_weight * l_dice + loss_focal_weight * l_focal
    metrics["loss_DICE"] = l_dice
    metrics["loss_focal"] = l_focal
    metrics["loss_total"] = total
    return total, metrics
