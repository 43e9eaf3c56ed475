"""MSDeformAttn flax module (reference: alonet/deformable_detr/ops/modules/
ms_deform_attn.py:34).

Projects queries to per-head/level/point sampling offsets + attention weights
(softmax over level x point), samples the flattened multi-level value map via
the core op (ops/ms_deform_attn.py) and projects the result. Offset bias is
grid-initialized exactly like ``_reset_parameters`` (ms_deform_attn.py:70):
head h points at direction 2*pi*h/nH scaled by point index.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ...ops.ms_deform_attn import ms_deform_attn


def _grid_init_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    # core-op implementation (ops/ms_deform_attn.py): the Pallas one-hot
    # MXU kernel is fastest on TPU at both sites — round-3 transposed
    # construction: encoder 37 ms vs 205 ('block') / 463 ('fast'), decoder
    # 1.5 vs 7.6 / 11.8 ms (bf16, B=8, 640px levels). Backward = autodiff
    # of the 'block' formulation via the custom VJP.
    impl: str = "pallas"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 input_spatial_shapes: Sequence[Tuple[int, int]],
                 input_padding_mask: Optional[jnp.ndarray] = None):
        """query: (B, Lq, C); reference_points: (B, Lq, L, 2) or (..., 4) in
        [0, 1]; input_flatten: (B, Lv, C); padding_mask: (B, Lv), 1 = padded."""
        B, Lq, _ = query.shape
        Lv = input_flatten.shape[1]
        nH, L, P = self.n_heads, self.n_levels, self.n_points
        head_dim = self.d_model // nH

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(
            input_flatten)
        if input_padding_mask is not None:
            value = value * (input_padding_mask < 0.5)[..., None]
        value = value.reshape(B, Lv, nH, head_dim)

        offsets = nn.Dense(
            nH * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(_grid_init_bias(nH, L, P)),
            name="sampling_offsets")(query).reshape(B, Lq, nH, L, P, 2)
        weights = nn.Dense(nH * L * P, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           name="attention_weights")(query)
        weights = nn.softmax(weights.reshape(B, Lq, nH, L * P), axis=-1)
        weights = weights.reshape(B, Lq, nH, L, P)

        shapes = jnp.asarray(input_spatial_shapes, jnp.float32)  # (L, 2) hw
        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (W, H) (ms_deform_attn.py:118)
            normalizer = jnp.stack([shapes[:, 1], shapes[:, 0]], -1)
            loc = reference_points[:, :, None, :, None, :] \
                + offsets / normalizer[None, None, None, :, None, :]
        elif reference_points.shape[-1] == 4:
            loc = reference_points[:, :, None, :, None, :2] \
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(value, tuple(input_spatial_shapes),
                             loc.astype(value.dtype),
                             weights.astype(value.dtype), impl=self.impl)
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
