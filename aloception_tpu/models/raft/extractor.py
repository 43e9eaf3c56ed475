"""RAFT feature/context encoders (reference: alonet/raft/extractor.py:114
BasicEncoder, :176 SmallEncoder).

Conv stem stride 2 -> three residual stages (the last two stride 2) -> 1x1
projection; output at 1/8 resolution. Norms: 'instance' (fnet), 'group', or
'none'. The reference's cnet uses BatchNorm; running-stats BN is replaced by
GroupNorm(8) here (stats-free, same role for from-scratch training — noted
deliberate divergence for TPU-friendly stateless modules).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def make_norm(norm_fn: str, dtype=jnp.float32):
    if norm_fn == "instance":
        # per-sample, per-channel spatial norm without affine (torch default)
        return lambda name: nn.GroupNorm(num_groups=None, group_size=1,
                                         use_bias=False, use_scale=False,
                                         dtype=dtype, name=name)
    if norm_fn in ("group", "batch"):
        return lambda name: nn.GroupNorm(num_groups=8, dtype=dtype, name=name)
    if norm_fn == "none":
        return lambda name: (lambda x: x)
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    """(extractor.py:5)"""
    features: int
    norm_fn: str = "instance"
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm_fn, self.dtype)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=1, dtype=self.dtype, name="conv1")(x)
        n1 = norm("norm1")
        y = nn.relu(n1(y) if callable(n1) else y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        n2 = norm("norm2")
        y = n2(y) if callable(n2) else y
        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=self.strides,
                        dtype=self.dtype, name="downsample")(x)
            n3 = norm("norm3")
            x = n3(x) if callable(n3) else x
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """(extractor.py:114) NHWC in, (B, H/8, W/8, output_dim) out."""
    output_dim: int = 256
    norm_fn: str = "instance"
    dims: tuple = (64, 64, 96, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm_fn, self.dtype)
        x = nn.Conv(self.dims[0], (7, 7), strides=2, padding=3,
                    dtype=self.dtype, name="conv1")(x)
        n = norm("norm1")
        x = nn.relu(n(x) if callable(n) else x)
        for i, (f, s) in enumerate(zip(self.dims[1:], (1, 2, 2))):
            x = ResidualBlock(f, self.norm_fn, strides=s, dtype=self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(f, self.norm_fn, strides=1, dtype=self.dtype,
                              name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


class SmallEncoder(BasicEncoder):
    """(extractor.py:176) bottlenecked variant for RAFT-small."""
    output_dim: int = 128
    dims: tuple = (32, 32, 64, 96)
