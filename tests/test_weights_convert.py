"""Torch->flax weight conversion parity (reference: the detr-r50 checkpoint
layout from alonet/common/weights.py + detr/transformer.py).

Numerical parity checks run against torch CPU ops (baked into the image) on
random weights — the strongest offline proxy for loading the published
checkpoints (no network egress for the real .pth files).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from aloception_tpu.utils.weights import (
    convert_conv, convert_linear, convert_mha, convert_resnet50_backbone)


def test_conv_parity():
    """flax Conv with converted torch weights == torch Conv2d."""
    import flax.linen as nn
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 16, 8).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 4, 3, stride=2, padding=1, bias=True)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    fconv = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = {"params": {
        "kernel": convert_conv(tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy()}}
    fy = fconv.apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(fy).transpose(0, 3, 1, 2)
                  - ty.numpy()).max() < 1e-4


def test_frozen_bn_parity():
    """FrozenBatchNorm == torch BatchNorm2d.eval()."""
    from aloception_tpu.models.backbone import FrozenBatchNorm
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(16).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.randn(16).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.randn(16).astype(np.float32)))
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(16).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2, 16).astype(np.float32)))
        ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    params = {"params": {
        "scale": tbn.weight.detach().numpy(),
        "bias": tbn.bias.detach().numpy(),
        "mean": tbn.running_mean.numpy(),
        "var": tbn.running_var.numpy()}}
    fy = FrozenBatchNorm(16).apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(fy).transpose(0, 3, 1, 2)
                  - ty.numpy()).max() < 1e-4


def test_mha_parity():
    """flax MultiHeadDotProductAttention with converted packed in_proj ==
    torch nn.MultiheadAttention (the DETR attention primitive,
    detr/transformer.py:220)."""
    import flax.linen as nn
    d, h, L, B = 32, 4, 6, 2
    rng = np.random.RandomState(0)
    q = rng.randn(B, L, d).astype(np.float32)
    k = rng.randn(B, L, d).astype(np.float32)
    v = rng.randn(B, L, d).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(d, h, batch_first=True).eval()
    with torch.no_grad():
        ty, _ = tmha(torch.from_numpy(q), torch.from_numpy(k),
                     torch.from_numpy(v), need_weights=False)

    sd = {f"attn.{kk}": vv.detach().numpy()
          for kk, vv in tmha.state_dict().items()}
    converted = convert_mha(sd, "attn", d, h)
    fmha = nn.MultiHeadDotProductAttention(num_heads=h, qkv_features=d,
                                           deterministic=True)
    fy = fmha.apply({"params": converted}, jnp.asarray(q), jnp.asarray(k),
                    jnp.asarray(v))
    assert np.abs(np.asarray(fy) - ty.numpy()).max() < 1e-4


def test_resnet_backbone_conversion_structure():
    """Synthetic torchvision-style state dict converts into the flax trunk
    with matching shapes."""
    from aloception_tpu.models.backbone import Backbone
    rng = np.random.RandomState(0)

    sd = {}
    def add_bn(name, c):
        sd[name + ".weight"] = rng.randn(c).astype(np.float32)
        sd[name + ".bias"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)

    pre = "backbone.0.body."
    sd[pre + "conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    add_bn(pre + "bn1", 64)
    cin = 64
    for li, (blocks, feats) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512)), start=1):
        for b in range(blocks):
            src = f"{pre}layer{li}.{b}."
            sd[src + "conv1.weight"] = rng.randn(feats, cin, 1, 1).astype(np.float32)
            add_bn(src + "bn1", feats)
            sd[src + "conv2.weight"] = rng.randn(feats, feats, 3, 3).astype(np.float32)
            add_bn(src + "bn2", feats)
            sd[src + "conv3.weight"] = rng.randn(feats * 4, feats, 1, 1).astype(np.float32)
            add_bn(src + "bn3", feats * 4)
            if b == 0:
                sd[src + "downsample.0.weight"] = \
                    rng.randn(feats * 4, cin, 1, 1).astype(np.float32)
                add_bn(src + "downsample.1", feats * 4)
            cin = feats * 4

    converted = convert_resnet50_backbone(sd)
    bb = Backbone(return_layers=("layer4",))
    ref = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                  jnp.zeros((1, 64, 64)))["params"]
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    conv_flat = dict(jax.tree_util.tree_leaves_with_path(converted))
    missing = []
    for path, leaf in ref_flat:
        if path not in conv_flat:
            missing.append(jax.tree_util.keystr(path))
        elif conv_flat[path].shape != leaf.shape:
            raise AssertionError(
                f"shape mismatch {jax.tree_util.keystr(path)}: "
                f"{conv_flat[path].shape} vs {leaf.shape}")
    assert not missing, f"missing params: {missing[:5]}"
    # converted backbone actually runs
    out = bb.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 64, 64)))
    assert out[0][0].shape == (1, 2, 2, 2048)
