"""ResNet backbone with frozen BatchNorm, NHWC, flax.linen.

TPU re-design of the reference DETR backbone
(/root/reference/alonet/detr/backbone.py:50-203): torchvision ResNet-50 with
``FrozenBatchNorm2d`` (backbone.py:17-47) and an IntermediateLayerGetter that
exposes layer1..layer4 feature maps plus a nearest-interpolated padding mask
per level (backbone.py:90-120).

Here the frozen BN is an affine fold: scale/bias/mean/var are plain params
(never updated — the optimizer masks them via ``frozen_bn_mask``), applied as
a fused multiply-add that XLA folds into the preceding conv. Layout is NHWC
(TPU conv native); weight converters from torch NCHW live in
``models/convert.py``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics and affine params
    (reference backbone.py:17: FrozenBatchNorm2d)."""
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses with the conv)
        w = scale / jnp.sqrt(var + self.eps)
        b = bias - mean * w
        return x * w.astype(self.dtype) + b.astype(self.dtype)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck block (1x1 -> 3x3 -> 1x1, expansion 4)."""
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.features * 4, dtype=self.dtype,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


def space_to_depth(x, factor: int = 2):
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f), parity-major channel order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        B, H // factor, W // factor, factor * factor * C)


def conv1_to_s2d_kernel(w7: "jnp.ndarray") -> "jnp.ndarray":
    """Exact rewrite of the 7x7/stride-2 stem kernel into the
    space-to-depth(2) + 4x4/stride-1 form: w4[a, b, (p, q, c), o] =
    w8[2a+p, 2b+q, c, o] with w8 = w7 zero-padded at offset (1, 1).
    (The MLPerf-ResNet trick: the 3-input-channel 7x7 conv uses 3/128 MXU
    lanes; after s2d it uses 12/128 and 4x fewer positions.)"""
    w8 = jnp.zeros((8, 8) + w7.shape[2:], w7.dtype).at[1:8, 1:8].set(w7)
    C, O = w7.shape[2], w7.shape[3]
    w4 = jnp.zeros((4, 4, 4 * C, O), w7.dtype)
    for p in range(2):
        for q in range(2):
            # channel block layout matches space_to_depth: (p, q, c)
            w4 = w4.at[:, :, (p * 2 + q) * C:(p * 2 + q + 1) * C, :].set(
                w8[p::2, q::2][:4, :4])
    return w4


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning {layer1..layer4} NHWC feature maps.

    space_to_depth=True rewrites the 7x7/2 stem as s2d(2) + 4x4/1 conv —
    numerically identical given converted weights (conv1_to_s2d_kernel) and
    ~4x faster on the MXU (3 -> 12 input lanes, 1/4 the positions)."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    space_to_depth: bool = False
    # NOTE a fused whole-stage-1 Pallas kernel (VMEM-resident bottleneck
    # stack) was built and hardware-gated in round 4: it beat the XLA
    # stack in a synthetic stage bench (15.8 vs 21.1 ms bs32 bf16) but
    # LOST end-to-end in DETR (41.4 vs 32.0 ms) — in-model, XLA fuses
    # layer1 with its neighbors better than the strip harness predicts.
    # Deleted per the no-knob-limbo rule; see DEVELOPMENT.md round 4.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        if self.space_to_depth:
            x = space_to_depth(x, 2)
            x = nn.Conv(64, (4, 4), strides=(1, 1), padding=((2, 1), (2, 1)),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = {}
        features = 64
        for i, num_blocks in enumerate(self.stage_sizes):
            strides = 1 if i == 0 else 2
            for j in range(num_blocks):
                x = Bottleneck(
                    features,
                    strides=strides if j == 0 else 1,
                    downsample=(j == 0),
                    dtype=self.dtype,
                    name=f"layer{i + 1}_block{j}")(x)
            feats[f"layer{i + 1}"] = x
            features *= 2
        return feats


class Backbone(nn.Module):
    """Backbone wrapper mirroring reference Backbone (backbone.py:50):
    returns [(feature NHWC, mask), ...] for the requested layers, with the
    padding mask max-pooled (any-padded) to each feature resolution."""
    return_layers: Sequence[str] = ("layer4",)
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    space_to_depth: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, mask=None) -> Sequence[Tuple[jnp.ndarray, jnp.ndarray]]:
        """images: (B, H, W, 3). mask: (B, H, W) bool/float, 1 = padded
        (the batch_list padded-area mask)."""
        feats = ResNet(stage_sizes=self.stage_sizes, dtype=self.dtype,
                       space_to_depth=self.space_to_depth,
                       name="trunk")(images)
        if mask is None:
            mask = jnp.zeros(images.shape[:3], dtype=jnp.float32)
        mask = mask.astype(jnp.float32)
        out = []
        for layer in self.return_layers:
            f = feats[layer]
            h, w = f.shape[1], f.shape[2]
            # nearest-resize of mask to feature resolution (backbone.py:118)
            m = jax.image.resize(mask, (mask.shape[0], h, w), method="nearest")
            out.append((f, m))
        return out


def frozen_bn_mask(params) -> Any:
    """Pytree mask: True for trainable params, False for frozen-BN stats —
    feed to ``optax.masked`` so BN params never update (the analog of
    requires_grad=False in backbone.py:17)."""
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: not any(p.startswith(("bn", "downsample_bn")) for p in k)
            for k in flat}
    return flax.traverse_util.unflatten_dict(mask)
