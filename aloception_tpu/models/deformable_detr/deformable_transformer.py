"""Deformable transformer (reference: alonet/deformable_detr/
deformable_transformer.py:22): multi-scale encoder with per-level reference
points and valid ratios, decoder with MSDeformAttn cross-attention and
optional iterative box refinement.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .ms_deform_attn import MSDeformAttn


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def get_valid_ratios(masks: List[jnp.ndarray]) -> jnp.ndarray:
    """Unpadded fraction of each level's H and W (deformable_transformer.py:
    get_valid_ratio). masks: list of (B, H_l, W_l), 1 = padded.
    Returns (B, L, 2) as (ratio_w, ratio_h)."""
    ratios = []
    for m in masks:
        not_m = 1.0 - m.astype(jnp.float32)
        valid_h = not_m[:, :, 0].sum(1)
        valid_w = not_m[:, 0, :].sum(1)
        ratios.append(jnp.stack([valid_w / m.shape[2], valid_h / m.shape[1]], -1))
    return jnp.stack(ratios, 1)


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]],
                             valid_ratios: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normalized reference points for every level
    (deformable_transformer.py:354 get_reference_points: each level's grid is
    normalized by THAT level's valid ratio). Returns (B, Lv, L, 2)."""
    ref_list = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ys, xs = jnp.meshgrid(
            jnp.linspace(0.5, H - 0.5, H), jnp.linspace(0.5, W - 0.5, W),
            indexing="ij")
        ref_y = ys.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * H)
        ref_x = xs.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * W)
        ref_list.append(jnp.stack([ref_x, ref_y], -1))
    ref = jnp.concatenate(ref_list, 1)               # (B, Lv, 2)
    return ref[:, :, None] * valid_ratios[:, None]   # (B, Lv, L, 2)


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    dim_feedforward: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    msda_impl: str = "pallas"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 padding_mask=None, deterministic=True):
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            dtype=self.dtype, name="self_attn")(
            src + pos, reference_points, src, spatial_shapes, padding_mask)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(src2))
        src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        src2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(src2))
        src2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(src2)
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(src2))
        return src


class DeformableDecoderLayer(nn.Module):
    d_model: int = 256
    dim_feedforward: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    msda_impl: str = "pallas"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask=None, deterministic=True):
        q = k = tgt + query_pos
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype, name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, reference_points, src, spatial_shapes,
            src_padding_mask)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        tgt2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        tgt2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(tgt2))
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(tgt2)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        return tgt


class DeformableTransformer(nn.Module):
    """(deformable_transformer.py:22) returns (hs (layers, B, Nq, C),
    init_reference (B, Nq, 2), inter_references (layers, B, Nq, 2|4),
    memory)."""
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_points: int = 4
    with_box_refine: bool = False
    msda_impl: str = "pallas"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, srcs: List, masks: List, pos_embeds: List, query_embed,
                 bbox_embed_fns: Optional[List] = None, deterministic=True):
        """srcs/masks/pos_embeds: per-level NHWC features, (B,H,W) masks,
        NHWC positional embeddings. query_embed: (Nq, 2*d)."""
        B = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.n_levels, self.d_model))

        src_flat, mask_flat, pos_flat = [], [], []
        for lvl, (src, m, pos) in enumerate(zip(srcs, masks, pos_embeds)):
            src_flat.append(src.reshape(B, -1, self.d_model))
            mask_flat.append(m.reshape(B, -1))
            pos_flat.append(pos.reshape(B, -1, self.d_model)
                            + level_embed[lvl].astype(self.dtype))
        src = jnp.concatenate(src_flat, 1)
        mask = jnp.concatenate(mask_flat, 1)
        pos = jnp.concatenate(pos_flat, 1)

        valid_ratios = get_valid_ratios(masks)
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)

        from ...parallel import constrain_tokens

        memory = src
        for i in range(self.num_encoder_layers):
            # sequence-parallel hook (no-op off-mesh): FFN/LayerNorm stay
            # token-sharded; XLA gathers value planes only for the MSDA op
            memory = constrain_tokens(memory)
            memory = DeformableEncoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.n_levels, self.n_heads, self.n_points,
                msda_impl=self.msda_impl, dtype=self.dtype,
                name=f"encoder_layer{i}")(
                memory, pos, enc_ref, spatial_shapes, mask, deterministic)

        # queries: embed split into (query_pos, tgt)
        # (deformable_detr.py:260 2x hidden embed)
        query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None], (B,) + query_pos.shape)
        tgt = jnp.broadcast_to(tgt[None], (B,) + tgt.shape)

        reference_points = nn.sigmoid(
            nn.Dense(2, dtype=jnp.float32, name="reference_points")(query_pos))
        init_reference = reference_points

        intermediates, inter_refs = [], []
        for i in range(self.num_decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = reference_points[:, :, None] * jnp.concatenate(
                    [valid_ratios, valid_ratios], -1)[:, None]
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            tgt = DeformableDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.n_levels, self.n_heads, self.n_points,
                msda_impl=self.msda_impl, dtype=self.dtype,
                name=f"decoder_layer{i}")(
                tgt, query_pos, ref_input, memory, spatial_shapes, mask,
                deterministic)
            # iterative refinement (deformable_detr.py:282-294): per-layer
            # box head updates the reference points, gradient detached
            if self.with_box_refine and bbox_embed_fns is not None:
                delta = bbox_embed_fns[i](tgt)
                if reference_points.shape[-1] == 4:
                    new_ref = nn.sigmoid(delta + inverse_sigmoid(reference_points))
                else:
                    xy = nn.sigmoid(delta[..., :2]
                                    + inverse_sigmoid(reference_points))
                    new_ref = jnp.concatenate(
                        [xy, nn.sigmoid(delta[..., 2:])], -1)
                reference_points = jax.lax.stop_gradient(new_ref)
            intermediates.append(tgt)
            inter_refs.append(reference_points)

        return (jnp.stack(intermediates, 0), init_reference,
                jnp.stack(inter_refs, 0), memory, spatial_shapes, valid_ratios)
