"""PanopticHead: mask prediction head over any DETR-family model
(reference: alonet/detr_panoptic/detr_panoptic.py:22).

Components:
- MHAttentionMap (nn/MHAttention.py:12): per-query multi-head attention
  scores over the encoder memory (no value projection — the maps themselves
  are the output).
- MaskHeadSmallConv (nn/FPNstyle.py:16): FPN-style conv stack fusing the
  projected memory + attention maps with backbone layer3/2/1 features,
  emitting one mask logit map per query at 1/4 resolution.

The wrapped detector runs with ``return_intermediate=True`` so its dict
carries dec_outputs / enc_outputs / bb_outputs; the head is a separate flax
module (the reference freezes the detector by default, detr_panoptic.py:80 —
here freezing is an optimizer mask, train/state.py style).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class MHAttentionMap(nn.Module):
    """(nn/MHAttention.py:12) q: (B, Nq, C); k: (B, H, W, C) ->
    softmax attention maps (B, Nq, nH, H, W)."""
    hidden_dim: int = 256
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, mask: Optional[jnp.ndarray] = None):
        B, Nq, _ = q.shape
        H, W = k.shape[1], k.shape[2]
        nH = self.num_heads
        hd = self.hidden_dim // nH
        q = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        k = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(k)
        qh = q.reshape(B, Nq, nH, hd)
        kh = k.reshape(B, H * W, nH, hd)
        scores = jnp.einsum("bqnc,bpnc->bqnp", qh, kh,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(hd)
        if mask is not None:
            pad = mask.reshape(B, 1, 1, H * W) > 0.5
            scores = jnp.where(pad, -1e9, scores)
        # the reference normalizes over heads AND space JOINTLY
        # (MHAttention.py:46 softmax(weights.flatten(2))), not per head
        attn = jax.nn.softmax(scores.reshape(B, Nq, nH * H * W), axis=-1)
        return attn.reshape(B, Nq, nH, H, W).astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """(nn/FPNstyle.py:16) conv stack with FPN lateral adds.

    x: (B*Nq, H, W, C + nH) -> (B*Nq, 8H, 8W, 1) mask logits."""
    hidden_dim: int = 256
    fpn_dims: Sequence[int] = (1024, 512, 256)  # layer3, layer2, layer1 chans
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fpns: List[jnp.ndarray]):
        import math
        d = self.hidden_dim
        dims = [d, d // 2, d // 4, d // 8, d // 16]

        def conv_gn_relu(x, feats, name):
            x = nn.Conv(feats, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(x)
            # GroupNorm(8, .) like the reference (FPNstyle.py:27-35); fall
            # back to the largest divisor <= 8 for small test configs
            x = nn.GroupNorm(num_groups=math.gcd(8, feats), epsilon=1e-5,
                             dtype=self.dtype, name=f"{name}_gn")(x)
            return nn.relu(x)

        # lay1 keeps the INPUT width (hidden_dim + n_heads -> same, the
        # reference's inter_dims[0] = dim, FPNstyle.py:25-26)
        x = conv_gn_relu(x, x.shape[-1], "lay1")
        x = conv_gn_relu(x, dims[1], "lay2")
        for i, fpn in enumerate(fpns):
            cur = nn.Conv(dims[i + 1], (1, 1), dtype=self.dtype,
                          name=f"adapter{i + 1}")(fpn)
            # expand fpn features across queries: x is (B*Nq, h, w, c)
            rep = x.shape[0] // cur.shape[0]
            cur = jnp.repeat(cur, rep, axis=0)
            up = jax.image.resize(x, (x.shape[0],) + cur.shape[1:3]
                                  + (x.shape[-1],), method="nearest")
            x = cur + up
            x = conv_gn_relu(x, dims[i + 2] if i + 2 < len(dims) else dims[-1],
                             f"lay{i + 3}")
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                       name="out_lay")(x)


class PanopticHead(nn.Module):
    """(detr_panoptic.py:22) consumes the detector's dict and appends
    ``pred_masks`` (B, Nq, H/4, W/4)."""
    hidden_dim: int = 256
    num_heads: int = 8
    fpn_dims: Sequence[int] = (1024, 512, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, m_outputs: Dict[str, Any]) -> Dict[str, Any]:
        hs = m_outputs["dec_outputs"][-1]            # (B, Nq, C)
        memory = m_outputs.get("enc_outputs_spatial",
                               m_outputs["enc_outputs"])  # (B, H, W, C)
        # DETR-family detectors emit spatial memory directly; deformable
        # exposes the un-flattened finest level as enc_outputs_spatial
        feat_mask = m_outputs.get("feat_mask")       # (B, H, W)
        bb_feats = m_outputs["bb_outputs"]           # [layer1, layer2, layer3]
        B, Nq, _ = hs.shape
        H, W = memory.shape[1], memory.shape[2]

        attn = MHAttentionMap(self.hidden_dim, self.num_heads,
                              dtype=self.dtype, name="bbox_attention")(
            hs, memory, feat_mask)                   # (B, Nq, nH, H, W)

        # mask-head input plane = the DETECTOR's input-projected C5 features
        # (detr_panoptic.py:170 proj_src = bb_lvl3_src_outputs; the head has
        # no projection of its own). Falls back to the encoder memory if a
        # detector doesn't expose proj_src.
        src_proj = m_outputs.get("proj_src", memory)   # (B, H, W, C)
        src_rep = jnp.repeat(src_proj, Nq, axis=0)     # (B*Nq, H, W, C)
        attn_maps = attn.reshape(B * Nq, self.num_heads, H, W)
        attn_maps = jnp.moveaxis(attn_maps, 1, -1)     # (B*Nq, H, W, nH)
        x = jnp.concatenate([src_rep, attn_maps], axis=-1)

        # FPN features ordered fine->coarse in bb_outputs (layer1..layer3);
        # the mask head consumes coarse->fine (nn/FPNstyle.py forward)
        fpns = list(reversed(bb_feats))
        masks = MaskHeadSmallConv(self.hidden_dim, self.fpn_dims,
                                  dtype=self.dtype, name="mask_head")(x, fpns)
        h4, w4 = masks.shape[1], masks.shape[2]
        out = dict(m_outputs)
        out["pred_masks"] = masks.reshape(B, Nq, h4, w4)
        return out


class DetrPanoptic(nn.Module):
    """Detector + PanopticHead in one module (detr_panoptic.py:22 wraps the
    DETR-family detector; :80 freezes it by default so only the head trains
    — here freezing = stop_gradient on the detector outputs, and the
    optimizer can additionally mask the subtree).

    ``detector`` is an UNBOUND flax module (or None for a default full
    DETR-R50); as a dataclass field it is auto-adopted by flax as the
    child named "detector" (param subtree params/detector/...)."""
    detector: Optional[nn.Module] = None
    num_classes: int = 250
    freeze_detector: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, mask=None, deterministic=True):
        if self.detector is not None:
            det = self.detector
        else:
            from ..detr import Detr
            det = Detr(num_classes=self.num_classes, return_intermediate=True,
                       dtype=self.dtype, name="detector")
        out = det(images, mask, deterministic=deterministic)
        if self.freeze_detector:
            out = jax.tree.map(
                lambda x: jax.lax.stop_gradient(x)
                if hasattr(x, "dtype") else x, out)
        return PanopticHead(hidden_dim=det.hidden_dim, num_heads=det.nheads,
                            dtype=self.dtype, name="panoptic_head")(out)


def inference_with_masks(m_outputs: Dict, threshold: float = 0.0,
                         background_class: Optional[int] = None,
                         activation_fn: str = "softmax",
                         mask_threshold: float = 0.5,
                         frame_size: Optional[tuple] = None):
    """Full panoptic inference: per-frame (BoundingBoxes2D, Mask) with the
    same query filter applied to both (detr_panoptic.py:227-).

    ``frame_size`` (H, W): the head predicts masks at stride 4; the
    reference bilinearly upsamples them to the frame size before
    thresholding (detr_panoptic.py:239 F.interpolate) — pass the input
    image size so the returned Masks align with full-resolution ground
    truth (PQMetrics compares pixelwise)."""
    import cv2
    from ...aloscene import BoundingBoxes2D, Labels, Mask

    logits = np.asarray(m_outputs["pred_logits"])
    pred_boxes = np.asarray(m_outputs["pred_boxes"])
    pred_masks = np.asarray(m_outputs["pred_masks"])
    B, Nq, C = logits.shape
    if activation_fn == "softmax":
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        bg = C - 1 if background_class is None else background_class
        labels = probs.argmax(-1)
        scores = probs.max(-1)
        keep_all = (labels != bg) & (scores > threshold)
    else:
        probs = 1 / (1 + np.exp(-logits))
        labels = probs.argmax(-1)
        scores = probs.max(-1)
        keep_all = scores > threshold

    results = []
    for b in range(B):
        keep = keep_all[b]
        lab = Labels(labels[b][keep].astype(np.float32),
                     scores=scores[b][keep].astype(np.float32))
        boxes = BoundingBoxes2D(pred_boxes[b][keep].astype(np.float32),
                                boxes_format="xcyc", absolute=False,
                                labels=lab)
        m = 1 / (1 + np.exp(-pred_masks[b][keep]))
        if frame_size is not None and m.shape[0] and \
                tuple(m.shape[1:]) != tuple(frame_size):
            # (N, h, w) -> (h, w, N) for cv2, bilinear like the reference
            up = cv2.resize(m.transpose(1, 2, 0),
                            (int(frame_size[1]), int(frame_size[0])),
                            interpolation=cv2.INTER_LINEAR)
            m = up[..., None].transpose(2, 0, 1) if up.ndim == 2 \
                else up.transpose(2, 0, 1)
        elif frame_size is not None and not m.shape[0]:
            m = np.zeros((0,) + tuple(frame_size), m.dtype)
        masks = Mask((m > mask_threshold).astype(np.float32),
                     labels=lab.clone())
        results.append((boxes, masks))
    return results
