"""Shared transformer building blocks (reference: alonet/transformers/).

- MLP (mlp.py:6): simple multi-layer perceptron head.
- PositionEmbeddingSine (position_encoding.py:9): 2-D sine positional
  encoding computed from the *non-padded* area of the padding mask via
  cumulative sums, so positions stretch over the valid region only.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    """(mlp.py:6) — hidden_dim x (num_layers-1) -> output_dim, ReLU between."""
    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name=f"layer{self.num_layers - 1}")(x)


def position_embedding_sine(mask, num_pos_feats: int = 64,
                            temperature: float = 10000.0,
                            normalize: bool = True, scale: float = None,
                            eps: float = 1e-6, center: bool = False,
                            dtype=jnp.float32):
    """2-D sine positional embedding (position_encoding.py:27).

    mask: (B, H, W) float/bool, 1 = PADDED. Returns (B, H, W, 2*num_pos_feats)
    NHWC (channel-last, TPU layout; the reference emits NCHW).
    """
    if scale is None:
        scale = 2 * jnp.pi
    not_mask = 1.0 - mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if center:
        y_embed = y_embed - 0.5
        x_embed = x_embed - 0.5
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)
