"""Bilinear sampling / warping primitives (jnp, jit/vmap-friendly).

The grid_sample analog used by RAFT's correlation lookup (reference:
alonet/raft/corr.py:29-60 bilinear_sampler) and by the deformable-attention
lax reference. align_corners=True semantics like the reference's
F.grid_sample usage; out-of-range samples are zero-padded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img, x, y):
    """Sample ``img`` (H, W, C) at float pixel coords x, y (...,) -> (..., C).

    Zero padding outside the image.
    """
    H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        xx = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yy = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        v = img[yy, xx]
        return v * valid[..., None]

    x0i, y0i = x0, y0
    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def coords_grid(H: int, W: int, dtype=jnp.float32):
    """(H, W, 2) pixel coordinate grid, channels (x, y) — raft/utils."""
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                          jnp.arange(W, dtype=dtype), indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def warp(img, flow):
    """Backward-warp (H, W, C) by flow (H, W, 2): out(x) = img(x + flow)."""
    H, W, _ = img.shape
    grid = coords_grid(H, W, img.dtype) + flow
    return bilinear_sample(img, grid[..., 0], grid[..., 1])
