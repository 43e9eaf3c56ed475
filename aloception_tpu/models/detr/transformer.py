"""DETR encoder-decoder transformer (reference: alonet/detr/transformer.py:31-477).

Post-norm, 6 encoder + 6 decoder layers, d_model 256, 8 heads, FFN 2048.
Positional embeddings are added to q/k only (never to v), queries are learned
embeddings added at every decoder layer, and the decoder returns every
intermediate layer output (for the aux losses) after the final LayerNorm.

Batch-first (B, L, C) layout — contiguous for TPU matmuls (the reference uses
torch's (L, B, C)).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn


def _key_padding_to_attn_mask(key_padding_mask: Optional[jnp.ndarray],
                              q_len: int):
    """(B, L_kv) with 1 = padded -> (B, 1, q_len, L_kv) bool, True = attend."""
    if key_padding_mask is None:
        return None
    attend = key_padding_mask < 0.5
    return attend[:, None, None, :].repeat(q_len, axis=2)


class EncoderLayer(nn.Module):
    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, deterministic=True):
        q = k = src + pos
        attn_mask = _key_padding_to_attn_mask(key_padding_mask, src.shape[1])
        src2 = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype, name="self_attn")(q, k, src, mask=attn_mask)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(src2))
        src2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        src2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(src2))
        src2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(src2)
        src = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            src + nn.Dropout(self.dropout, deterministic=deterministic)(src2))
        return src


class DecoderLayer(nn.Module):
    d_model: int = 256
    nheads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, key_padding_mask=None,
                 deterministic=True):
        q = k = tgt + query_pos
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype, name="self_attn")(q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        attn_mask = _key_padding_to_attn_mask(key_padding_mask, tgt.shape[1])
        tgt2 = nn.MultiHeadDotProductAttention(
            num_heads=self.nheads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, memory + pos, memory, mask=attn_mask)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        tgt2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        tgt2 = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(tgt2))
        tgt2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(tgt2)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2))
        return tgt


class Transformer(nn.Module):
    """(transformer.py:31) returns (decoder_outputs (num_layers, B, Nq, C),
    encoder memory (B, L, C))."""
    d_model: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, query_embed, key_padding_mask=None,
                 deterministic=True):
        """src: (B, L, C) flattened features; pos: (B, L, C); query_embed:
        (Nq, C) learned queries (broadcast to batch)."""
        from ...parallel import constrain_tokens

        memory = src
        for i in range(self.num_encoder_layers):
            # sequence-parallel hook: no-op off-mesh; under a mesh with
            # sp>1 keeps LayerNorm/FFN token-sharded (parallel/shard.py)
            memory = constrain_tokens(memory)
            memory = EncoderLayer(
                self.d_model, self.nheads, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"encoder_layer{i}")(
                memory, pos, key_padding_mask, deterministic)

        bs = src.shape[0]
        query_pos = jnp.broadcast_to(query_embed[None], (bs,) + query_embed.shape)
        tgt = jnp.zeros_like(query_pos)
        final_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        intermediates = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(
                self.d_model, self.nheads, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"decoder_layer{i}")(
                tgt, memory, pos, query_pos, key_padding_mask, deterministic)
            intermediates.append(final_norm(tgt))
        return jnp.stack(intermediates, axis=0), memory
