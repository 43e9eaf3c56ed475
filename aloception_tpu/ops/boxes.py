"""Pure, jit-compatible box geometry ops (jnp).

Functional core shared by aloscene.BoundingBoxes2D (host-side containers,
/root/reference/aloscene/bounding_boxes_2d.py:133-628) and the on-device DETR
criteria/matchers. Everything here is static-shape and traces under jit.

Formats: ``xcyc`` (xc, yc, w, h) | ``xyxy`` (x1, y1, x2, y2) | ``yxyx``.
"""

from __future__ import annotations

import jax.numpy as jnp

FORMATS = ("xcyc", "xyxy", "yxyx")


def xcyc_to_xyxy(b):
    xy, wh = b[..., :2], b[..., 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def xyxy_to_xcyc(b):
    lo, hi = b[..., :2], b[..., 2:4]
    return jnp.concatenate([lo + (hi - lo) / 2, hi - lo], axis=-1)


def xyxy_to_yxyx(b):
    return jnp.concatenate(
        [b[..., :2][..., ::-1], b[..., 2:4][..., ::-1]], axis=-1)


yxyx_to_xyxy = xyxy_to_yxyx  # involution


def xcyc_to_yxyx(b):
    return xyxy_to_yxyx(xcyc_to_xyxy(b))


def yxyx_to_xcyc(b):
    return xyxy_to_xcyc(yxyx_to_xyxy(b))


_CONVERT = {
    ("xcyc", "xyxy"): xcyc_to_xyxy,
    ("xyxy", "xcyc"): xyxy_to_xcyc,
    ("xyxy", "yxyx"): xyxy_to_yxyx,
    ("yxyx", "xyxy"): yxyx_to_xyxy,
    ("xcyc", "yxyx"): xcyc_to_yxyx,
    ("yxyx", "xcyc"): yxyx_to_xcyc,
}


def convert_format(b, src: str, dst: str):
    if src == dst:
        return b
    return _CONVERT[(src, dst)](b)


def area_xyxy(b):
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def iou_xyxy(boxes1, boxes2, ret_union: bool = False, eps: float = 0.0):
    """Pairwise IoU of two xyxy sets: (N,4),(M,4) -> (N,M)
    (bounding_boxes_2d.py:523)."""
    area1 = area_xyxy(boxes1)
    area2 = area_xyxy(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / (union + eps)
    if ret_union:
        return iou, union
    return iou


def giou_xyxy(boxes1, boxes2, eps: float = 0.0):
    """Pairwise generalized IoU (https://giou.stanford.edu/),
    (bounding_boxes_2d.py:573)."""
    iou, union = iou_xyxy(boxes1, boxes2, ret_union=True, eps=eps)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / (area + eps)


def giou_xyxy_paired(boxes1, boxes2, eps: float = 1e-9):
    """Element-wise GIoU of aligned box pairs (..., 4) -> (...)."""
    area1 = area_xyxy(boxes1)
    area2 = area_xyxy(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / (union + eps)
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / (area_c + eps)


def nms_xyxy(boxes, scores, iou_threshold: float = 0.5):
    """Greedy NMS with static shapes (returns keep mask + score-sorted order).

    TPU-friendly replacement for torchvision nms (bounding_boxes_2d.py:628):
    O(N^2) matrix formulation — compute pairwise IoU once, then suppress any
    box overlapped (> threshold) by a higher-scored kept box. Returns
    (order, keep_mask_in_order): indices sorted by score and a bool mask of
    survivors, so callers can take a fixed top-K.
    """
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = iou_xyxy(b, b)
    n = boxes.shape[0]
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # j earlier (higher score)
    overlapped = iou > iou_threshold

    def body(i, keep):
        sup = jnp.any(tri[i] & overlapped[i] & keep)
        return keep.at[i].set(~sup)

    import jax
    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), dtype=bool))
    return order, keep
