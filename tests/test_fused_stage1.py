"""Fused ResNet stage-1 Pallas kernel vs the unfused flax stack.

The kernel (ops/pallas/fused_stage1.py) must reproduce the exact semantics
of three stride-1 Bottleneck blocks with frozen BN (models/backbone/
resnet.py; reference torchvision stack, alonet/detr/backbone.py:50-120),
including the image-boundary zero-padding of every 3x3 conv — the fused
strip sees real values in the halo, so the kernel's per-block mask is what
makes this exact rather than approximate. Interpret mode here; the real
lowering is gated by scripts/exp_fused_stage1.py on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from aloception_tpu.models.backbone.resnet import Bottleneck, ResNet
from aloception_tpu.ops.pallas.fused_stage1 import (
    fused_bottleneck_stage, stage_ref, fold_stage_params)


class _Stage(nn.Module):
    mid: int = 8

    @nn.compact
    def __call__(self, x):
        for j in range(3):
            x = Bottleneck(self.mid, strides=1, downsample=(j == 0),
                           name=f"layer1_block{j}")(x)
        return x


def _random_stage(rng, Ci=16, Cm=8):
    m = _Stage(mid=Cm)
    x0 = jnp.zeros((1, 8, 8, Ci), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x0)
    # randomize BN stats so the fold is non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [jnp.asarray(l) + 0.1 * jnp.asarray(
        rng.randn(*l.shape), l.dtype) for l in leaves]
    return m, jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("hw", [(16, 12), (10, 13), (7, 9)])
def test_fused_stage_matches_flax_stack(hw):
    rng = np.random.RandomState(0)
    m, params = _random_stage(rng)
    H, W = hw
    x = jnp.asarray(rng.randn(2, H, W, 16), jnp.float32)
    ref = m.apply(params, x)
    blocks = [params["params"][f"layer1_block{j}"] for j in range(3)]
    got = fused_bottleneck_stage(x, fold_stage_params(blocks))
    assert float(jnp.abs(ref - got).max()) < 1e-4


def test_fused_stage_matches_ref_oracle_and_grad():
    rng = np.random.RandomState(1)
    m, params = _random_stage(rng)
    x = jnp.asarray(rng.randn(2, 10, 13, 16), jnp.float32)
    blocks = [params["params"][f"layer1_block{j}"] for j in range(3)]
    fw = fold_stage_params(blocks)
    ref = stage_ref(x, fw)
    got = fused_bottleneck_stage(x, fw)
    assert float(jnp.abs(ref - got).max()) < 1e-5
    # custom_vjp backward == autodiff of the reference composition,
    # including grads into the folded weights (-> conv/bn params)
    ga = jax.grad(lambda xx: jnp.sum(jnp.sin(
        fused_bottleneck_stage(xx, fw))))(x)
    gb = jax.grad(lambda xx: jnp.sum(jnp.sin(stage_ref(xx, fw))))(x)
    assert float(jnp.abs(ga - gb).max()) < 1e-5
    gwa = jax.grad(lambda f: jnp.sum(fused_bottleneck_stage(x, f) ** 2))(fw)
    gwb = jax.grad(lambda f: jnp.sum(stage_ref(x, f) ** 2))(fw)
    for a, b in zip(jax.tree_util.tree_leaves(gwa),
                    jax.tree_util.tree_leaves(gwb)):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_resnet_fused_stage1_matches_unfused():
    """Same params, same outputs: the flag only changes the program."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 24, 3), jnp.float32)
    base = ResNet(stage_sizes=(3, 4), dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(3), x)
    ref = base.apply(params, x)
    fused = ResNet(stage_sizes=(3, 4), dtype=jnp.float32, fused_stage1=True)
    got = fused.apply(params, x)
    for k in ref:
        assert float(jnp.abs(ref[k] - got[k]).max()) < 1e-4, k


def test_resnet_fused_stage1_train_grads_match():
    """Training path: grads wrt params flow through the fold and match the
    unfused stack (custom_vjp recomputes via stage_ref)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    base = ResNet(stage_sizes=(3,), dtype=jnp.float32)
    params = base.init(jax.random.PRNGKey(5), x)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x)["layer1"] ** 2)
        return f

    fused = ResNet(stage_sizes=(3,), dtype=jnp.float32, fused_stage1=True)
    ga = jax.grad(loss(base))(params)
    gb = jax.grad(loss(fused))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, a in flat_a:
        b = flat_b[path]
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale < 1e-4, path
