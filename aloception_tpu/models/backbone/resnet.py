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


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning {layer1..layer4} NHWC feature maps."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, mask=None) -> Sequence[Tuple[jnp.ndarray, jnp.ndarray]]:
        """images: (B, H, W, 3). mask: (B, H, W) bool/float, 1 = padded
        (the batch_list padded-area mask)."""
        feats = ResNet(stage_sizes=self.stage_sizes, dtype=self.dtype,
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
