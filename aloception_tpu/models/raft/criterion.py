"""RAFT sequence loss + EPE metrics (reference: alonet/raft/criterion.py:14-50).

loss = sum_i gamma^(N-i-1) * |flow_i - gt|_1, excluding invalid pixels
(magnitude > max_flow); metrics: EPE and 1px/3px/5px accuracy.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp


def raft_sequence_loss(flow_preds: List, flow_gt, valid=None,
                       gamma: float = 0.8, max_flow: float = 400.0
                       ) -> Tuple[jnp.ndarray, Dict]:
    """flow_preds: list of (B, H, W, 2); flow_gt: (B, H, W, 2);
    valid: (B, H, W) 1 = supervise (occlusion/oob mask)."""
    n = len(flow_preds)
    mag = jnp.sqrt((flow_gt ** 2).sum(-1))
    v = (mag < max_flow).astype(jnp.float32)
    if valid is not None:
        v = v * valid.astype(jnp.float32)
    denom = jnp.maximum(v.sum(), 1.0)

    # Loss normalization matches the reference exactly: mean over ALL
    # elements (B,H,W,2) with invalid pixels zeroed (criterion.py:29
    # `(valid * i_loss).mean()`), NOT mean over valid pixels — on sparse-GT
    # data (KITTI) the two differ severalfold and reference-tuned LRs assume
    # the former. EPE metrics below average over valid pixels only, as the
    # reference does (criterion.py:40-41).
    loss = 0.0
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        l1 = jnp.abs(pred - flow_gt) * v[..., None]
        loss = loss + w * l1.mean()

    epe_map = jnp.sqrt(((flow_preds[-1] - flow_gt) ** 2).sum(-1))
    epe = (epe_map * v).sum() / denom
    metrics = {
        "loss_total": loss,
        "epe": epe,
        "1px": ((epe_map < 1).astype(jnp.float32) * v).sum() / denom,
        "3px": ((epe_map < 3).astype(jnp.float32) * v).sum() / denom,
        "5px": ((epe_map < 5).astype(jnp.float32) * v).sum() / denom,
    }
    return loss, metrics
