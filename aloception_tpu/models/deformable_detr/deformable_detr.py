"""Deformable DETR (reference: alonet/deformable_detr/deformable_detr.py:32).

Multi-scale (4-level) input projections with GroupNorm (ref :231-259), 300
queries from a 2x-hidden embedding (:260), sigmoid-focal or softmax
classification (activation_fn, :215-227), optional iterative box refinement
via per-layer box heads wired into the decoder (:282-294). Unlike the
reference, the CPU path works too (the reference forbids CPU at :257 because
of its CUDA-only op — our core op is pure lax/Pallas).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..backbone.resnet import Backbone
from ..transformers import MLP, position_embedding_sine
from .deformable_transformer import DeformableTransformer, inverse_sigmoid


class DeformableDETR(nn.Module):
    num_classes: int = 91
    hidden_dim: int = 256
    num_queries: int = 300
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = False
    msda_impl: str = "pallas"  # ops/ms_deform_attn.py: pallas|block|fast|lax
    activation_fn: str = "sigmoid"  # "sigmoid" (focal) | "softmax"
    aux_loss: bool = True
    return_intermediate: bool = False
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    space_to_depth: bool = True
    dtype: Any = jnp.float32

    @property
    def background_class(self) -> Optional[int]:
        return self.num_classes if self.activation_fn == "softmax" else None

    @nn.compact
    def __call__(self, images, mask=None, deterministic: bool = True
                 ) -> Dict[str, Any]:
        out_classes = self.num_classes + (1 if self.activation_fn == "softmax"
                                          else 0)
        layers = ("layer1", "layer2", "layer3", "layer4") \
            if self.return_intermediate else ("layer2", "layer3", "layer4")
        feats = Backbone(return_layers=layers, stage_sizes=self.stage_sizes,
                         space_to_depth=self.space_to_depth,
                         dtype=self.dtype, name="backbone")(images, mask)
        ms_feats = feats[-3:]  # C3, C4, C5

        srcs, masks, pos_embeds = [], [], []
        for lvl, (f, m) in enumerate(ms_feats):
            s = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj{lvl}")(f)
            s = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f"input_proj_gn{lvl}")(s)
            srcs.append(s)
            masks.append(m)
            # deformable's sine embedding is CENTERED (build_positional_
            # encoding deformable_detr.py:557: center=True), unlike DETR's
            pos_embeds.append(position_embedding_sine(
                m, num_pos_feats=self.hidden_dim // 2, center=True,
                dtype=self.dtype))
        # extra level: stride-2 conv on C5 (deformable_detr.py:241-252)
        if self.num_feature_levels > len(ms_feats):
            extra = nn.Conv(self.hidden_dim, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name="input_proj3")(ms_feats[-1][0])
            extra = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 dtype=self.dtype,
                                 name="input_proj_gn3")(extra)
            m_extra = jax.image.resize(
                masks[-1], (masks[-1].shape[0], extra.shape[1], extra.shape[2]),
                method="nearest")
            srcs.append(extra)
            masks.append(m_extra)
            pos_embeds.append(position_embedding_sine(
                m_extra, num_pos_feats=self.hidden_dim // 2, center=True,
                dtype=self.dtype))

        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (self.num_queries, 2 * self.hidden_dim))

        # heads: shared across layers, or per-layer clones for refinement
        n_heads = self.num_decoder_layers if self.with_box_refine else 1
        class_embeds = [nn.Dense(out_classes, dtype=self.dtype,
                                 name=f"class_embed{i}")
                        for i in range(n_heads)]
        bbox_embeds = [MLP(self.hidden_dim, 4, num_layers=3, dtype=self.dtype,
                           name=f"bbox_embed{i}")
                       for i in range(n_heads)]

        def bbox_fn(i):
            return bbox_embeds[i if self.with_box_refine else 0]

        hs, init_reference, inter_references, memory, spatial_shapes, \
            valid_ratios = DeformableTransformer(
                d_model=self.hidden_dim, n_heads=self.nheads,
                num_encoder_layers=self.num_encoder_layers,
                num_decoder_layers=self.num_decoder_layers,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                n_levels=self.num_feature_levels, n_points=self.dec_n_points,
                with_box_refine=self.with_box_refine,
                msda_impl=self.msda_impl, dtype=self.dtype,
                name="transformer")(
                srcs, masks, pos_embeds, query_embed.astype(self.dtype),
                bbox_embed_fns=[bbox_fn(i) for i in
                                range(self.num_decoder_layers)]
                if self.with_box_refine else None,
                deterministic=deterministic)

        # per-layer outputs (deformable_detr.py:forward heads)
        all_logits, all_boxes = [], []
        for lvl in range(self.num_decoder_layers):
            head = lvl if self.with_box_refine else 0
            ref = init_reference if lvl == 0 else inter_references[lvl - 1]
            logits = class_embeds[head](hs[lvl])
            delta = bbox_embeds[head](hs[lvl]).astype(jnp.float32)
            if ref.shape[-1] == 4:
                boxes = nn.sigmoid(delta + inverse_sigmoid(ref))
            else:
                xy = nn.sigmoid(delta[..., :2] + inverse_sigmoid(ref))
                boxes = jnp.concatenate([xy, nn.sigmoid(delta[..., 2:])], -1)
            all_logits.append(logits)
            all_boxes.append(boxes)

        out = {"pred_logits": all_logits[-1], "pred_boxes": all_boxes[-1]}
        if self.aux_loss:
            out["aux_outputs"] = [
                {"pred_logits": all_logits[i], "pred_boxes": all_boxes[i]}
                for i in range(self.num_decoder_layers - 1)]
        if self.return_intermediate:
            out["dec_outputs"] = hs
            out["enc_outputs"] = memory
            # PanopticHead consumes level L-2 (the C5-projected scale): the
            # reference exposes memory[-2] as enc_outputs and srcs[-2] as
            # the projected source (deformable_detr.py:401 + :294)
            plvl = len(srcs) - 2
            start = sum(h * w for h, w in spatial_shapes[:plvl])
            Hp, Wp = spatial_shapes[plvl]
            out["enc_outputs_spatial"] = memory[:, start:start + Hp * Wp] \
                .reshape(memory.shape[0], Hp, Wp, self.hidden_dim)
            out["proj_src"] = srcs[plvl]
            out["feat_mask"] = masks[plvl]
            # three FPN levels (layer1-3), same as detr.py:101 — the
            # reference panoptic mask head consumes bb_lvl0-2 identically
            # for both detectors (detr_panoptic.py:169)
            out["bb_outputs"] = [f for f, _ in feats[:-1]]
            out["bb_masks"] = [m for _, m in feats[:-1]]
            out["srcs_masks"] = masks
            out["spatial_shapes"] = spatial_shapes
        return out


def deformable_detr_r50(num_classes: int = 91, with_box_refine: bool = False,
                        dtype=jnp.float32, **kwargs) -> DeformableDETR:
    """(deformable_detr_r50.py:10 / _refinement.py:10)"""
    return DeformableDETR(num_classes=num_classes,
                          with_box_refine=with_box_refine, dtype=dtype,
                          **kwargs)


def inference(m_outputs: Dict, threshold: float = 0.2, frames=None,
              filter_label=None, activation_fn: str = "sigmoid"):
    """Sigmoid-focal inference -> aloscene boxes (deformable_detr.py:inference):
    scores = sigmoid(logits).max over classes; keep score > threshold."""
    from ...aloscene import BoundingBoxes2D, Labels

    logits = np.asarray(m_outputs["pred_logits"])
    pred_boxes = np.asarray(m_outputs["pred_boxes"])
    if activation_fn == "softmax":
        from ..detr.detr import inference as detr_inference
        return detr_inference({"pred_logits": logits, "pred_boxes": pred_boxes},
                              threshold=threshold,
                              background_class=logits.shape[-1] - 1,
                              filter_label=filter_label)
    probs = 1.0 / (1.0 + np.exp(-logits))
    labels = probs.argmax(-1)
    scores = probs.max(-1)
    all_boxes = []
    for b in range(logits.shape[0]):
        keep = scores[b] > threshold
        if filter_label is not None:
            keep &= labels[b] == filter_label
        all_boxes.append(BoundingBoxes2D(
            pred_boxes[b][keep].astype(np.float32), boxes_format="xcyc",
            absolute=False,
            labels=Labels(labels[b][keep].astype(np.float32),
                          scores=scores[b][keep].astype(np.float32))))
    return all_boxes
