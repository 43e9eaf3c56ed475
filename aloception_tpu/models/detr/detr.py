"""DETR: end-to-end detection transformer (reference: alonet/detr/detr.py:20).

Architecture (detr.py:81-96, 357-375): frozen-BN ResNet-50 backbone ->
1x1 input projection to d_model -> 6+6 post-norm transformer with 100 learned
queries -> class head (num_classes+1, softmax background) + 3-layer box MLP
with sigmoid (xcyc relative boxes). Forward returns a dict with per-decoder-
layer aux outputs (detr.py:126-247); ``inference`` converts the dict back
into aloscene BoundingBoxes2D + Labels (detr.py:315-355).

TPU design notes: NHWC everywhere; whole forward is one jit region; the
flatten H*W -> L happens once so the transformer runs on (B, L, 256)
matmuls on the MXU; bf16 activations optional via ``dtype``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..backbone.resnet import Backbone
from ..transformers import MLP, position_embedding_sine
from .transformer import Transformer


class Detr(nn.Module):
    num_classes: int = 91
    hidden_dim: int = 256
    num_queries: int = 100
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    aux_loss: bool = True
    return_intermediate: bool = False  # expose memory/backbone feats (panoptic)
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    space_to_depth: bool = True  # s2d stem: ~4x faster conv1 on MXU
    dtype: Any = jnp.float32

    @property
    def background_class(self) -> int:
        return self.num_classes

    @nn.compact
    def __call__(self, images, mask=None, deterministic: bool = True
                 ) -> Dict[str, Any]:
        """images: (B, H, W, 3) resnet-normalized NHWC; mask: (B, H, W),
        1 = padded (from aloscene.batch_list)."""
        # panoptic needs layer1-3 feats too (FPNstyle.py:16)
        layers = ("layer1", "layer2", "layer3", "layer4") \
            if self.return_intermediate else ("layer4",)
        feats = Backbone(return_layers=layers, stage_sizes=self.stage_sizes,
                         space_to_depth=self.space_to_depth,
                         dtype=self.dtype, name="backbone")(images, mask)
        src, feat_mask = feats[-1]
        B, H, W, _ = src.shape

        src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                      name="input_proj")(src)
        pos = position_embedding_sine(feat_mask, num_pos_feats=self.hidden_dim // 2,
                                      dtype=self.dtype)

        src_l = src.reshape(B, H * W, self.hidden_dim)
        pos_l = pos.reshape(B, H * W, self.hidden_dim)
        mask_l = feat_mask.reshape(B, H * W)

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.hidden_dim))
        hs, memory = Transformer(
            d_model=self.hidden_dim, nheads=self.nheads,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward, dropout=self.dropout,
            dtype=self.dtype, name="transformer")(
            src_l, pos_l, query_embed.astype(self.dtype), mask_l, deterministic)

        # heads applied to every decoder layer at once (detr.py:209)
        class_embed = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                               name="class_embed")
        bbox_embed = MLP(self.hidden_dim, 4, num_layers=3, dtype=self.dtype,
                         name="bbox_embed")
        logits = class_embed(hs)                       # (L, B, Nq, C+1)
        boxes = nn.sigmoid(bbox_embed(hs))             # (L, B, Nq, 4) xcyc rel

        out = {"pred_logits": logits[-1], "pred_boxes": boxes[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": logits[i], "pred_boxes": boxes[i]}
                for i in range(logits.shape[0] - 1)]
        if self.return_intermediate:
            out["dec_outputs"] = hs
            out["enc_outputs"] = memory.reshape(B, H, W, self.hidden_dim)
            # reference bb_lvl3_src_outputs = input_proj(C5) (detr.py:168):
            # the PanopticHead mask-head input plane
            out["proj_src"] = src
            out["bb_outputs"] = [f for f, _ in feats[:-1]]
            out["bb_masks"] = [m for _, m in feats[:-1]]
            out["feat_mask"] = feat_mask
        return out


def detr_r50(num_classes: int = 91, background_class: Optional[int] = None,
             aux_loss: bool = True, dtype=jnp.float32, **kwargs) -> Detr:
    """DETR-R50 configuration (reference: alonet/detr/detr_r50.py:11)."""
    return Detr(num_classes=num_classes, aux_loss=aux_loss, dtype=dtype, **kwargs)


def inference(m_outputs: Dict[str, Any], threshold: float = 0.0,
              background_class: int = 91, frames=None, filter_label=None):
    """Model dict -> aloscene BoundingBoxes2D + Labels (detr.py:315-355).

    Softmax over classes; a query is kept when its argmax is not the
    background class and its score exceeds ``threshold`` (detr.py:269-312).
    Host-side (dynamic output shapes); use ``inference_arrays`` under jit.
    """
    from ...aloscene import BoundingBoxes2D, Labels

    logits = np.asarray(m_outputs["pred_logits"])
    pred_boxes = np.asarray(m_outputs["pred_boxes"])
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    labels = probs.argmax(-1)
    scores = probs.max(-1)

    all_boxes = []
    for b in range(logits.shape[0]):
        keep = (labels[b] != background_class) & (scores[b] > threshold)
        if filter_label is not None:
            keep &= labels[b] == filter_label
        boxes = BoundingBoxes2D(
            pred_boxes[b][keep].astype(np.float32),
            boxes_format="xcyc", absolute=False,
            labels=Labels(labels[b][keep].astype(np.float32),
                          scores=scores[b][keep].astype(np.float32)))
        all_boxes.append(boxes)
    return all_boxes


def inference_arrays(m_outputs: Dict[str, Any], background_class: int = 91):
    """Jit-friendly static-shape inference: returns (boxes, labels, scores,
    keep_mask) each (B, Nq, ...) — the device half of ``inference``."""
    logits = m_outputs["pred_logits"]
    probs = jax.nn.softmax(logits, axis=-1)
    labels = jnp.argmax(probs, axis=-1)
    scores = jnp.max(probs, axis=-1)
    keep = labels != background_class
    return m_outputs["pred_boxes"], labels, scores, keep
