"""RAFT feature/context encoders (reference: alonet/raft/extractor.py:114
BasicEncoder, :190 SmallEncoder).

Conv stem stride 2 -> three residual stages (the last two stride 2) -> 1x1
projection; output at 1/8 resolution. Norm semantics follow the reference
exactly so converted checkpoints are numerically interchangeable:

- ``instance``: per-sample per-channel spatial norm, no affine, eps 1e-5
  (torch InstanceNorm2d defaults) — used by fnet.
- ``batch``: real BatchNorm with running stats (flax ``nn.BatchNorm``,
  ``batch_stats`` collection; train mode needs ``mutable=["batch_stats"]``)
  — used by cnet (extractor.py norm_fn="batch").
- ``group``: GroupNorm, eps 1e-5; stem uses 8 groups, residual blocks use
  planes//8 groups (extractor.py:14,121).
- ``none``: identity.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn


def make_norm(norm_fn: str, dtype=jnp.float32, train: bool = False,
              stem_groups: Optional[int] = None) -> Callable:
    """Returns norm(name, channels, groups=None) -> module/callable."""
    def build(name, channels, groups=None):
        if norm_fn == "instance":
            return nn.GroupNorm(num_groups=None, group_size=1,
                                use_bias=False, use_scale=False,
                                epsilon=1e-5, dtype=dtype, name=name)
        if norm_fn == "batch":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, dtype=dtype,
                                name=name)
        if norm_fn == "group":
            return nn.GroupNorm(num_groups=groups or max(channels // 8, 1),
                                epsilon=1e-5, dtype=dtype, name=name)
        if norm_fn == "none":
            return lambda x: x
        raise ValueError(norm_fn)
    return build


class ResidualBlock(nn.Module):
    """(extractor.py:5) two 3x3 convs, relu after EACH norm, relu again
    after the residual add; downsample = 1x1 conv + norm3, only when
    stride != 1."""
    features: int
    norm_fn: str = "instance"
    strides: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm_fn, self.dtype, self.train)
        g = self.features // 8
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("norm1", self.features, g)(y))
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(norm("norm2", self.features, g)(y))
        if self.strides != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.strides,
                        dtype=self.dtype, name="downsample")(x)
            x = norm("norm3", self.features, g)(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """(extractor.py:57) 1x1 -> 3x3(stride) -> 1x1 with planes//4 width;
    group-norm group count follows the reference oddity: planes//8 groups
    even on the planes//4-channel norms."""
    features: int
    norm_fn: str = "instance"
    strides: int = 1
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm_fn, self.dtype, self.train)
        quarter = self.features // 4
        g = self.features // 8
        y = nn.Conv(quarter, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("norm1", quarter, g)(y))
        y = nn.Conv(quarter, (3, 3), strides=self.strides, padding=1,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("norm2", quarter, g)(y))
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = nn.relu(norm("norm3", self.features, g)(y))
        if self.strides != 1:
            x = nn.Conv(self.features, (1, 1), strides=self.strides,
                        dtype=self.dtype, name="downsample")(x)
            x = norm("norm4", self.features, g)(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """(extractor.py:114) NHWC in, (B, H/8, W/8, output_dim) out."""
    output_dim: int = 256
    norm_fn: str = "instance"
    dims: tuple = (64, 64, 96, 128)
    train: bool = False
    dtype: Any = jnp.float32

    block_cls = ResidualBlock

    @nn.compact
    def __call__(self, x):
        norm = make_norm(self.norm_fn, self.dtype, self.train)
        x = nn.Conv(self.dims[0], (7, 7), strides=2, padding=3,
                    dtype=self.dtype, name="conv1")(x)
        # stem group-norm uses a fixed 8 groups (extractor.py:121,196)
        x = nn.relu(norm("norm1", self.dims[0], 8)(x))
        for i, (f, s) in enumerate(zip(self.dims[1:], (1, 2, 2))):
            x = self.block_cls(f, self.norm_fn, strides=s, train=self.train,
                               dtype=self.dtype, name=f"layer{i + 1}_0")(x)
            x = self.block_cls(f, self.norm_fn, strides=1, train=self.train,
                               dtype=self.dtype, name=f"layer{i + 1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


class SmallEncoder(BasicEncoder):
    """(extractor.py:190) bottlenecked variant for RAFT-small."""
    output_dim: int = 128
    dims: tuple = (32, 32, 64, 96)

    block_cls = BottleneckBlock
