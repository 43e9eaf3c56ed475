"""Deformable-DETR: core op reference semantics, module, criterion
(mirrors reference alonet/deformable_detr/ops/test.py:36 parity tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax
from aloception_tpu.models.deformable_detr import (
    DeformableDETR, deformable_criterion, inference)


def _torch_reference(value, shapes, loc, w):
    """Independent numpy port of ms_deform_attn_core_pytorch
    (ms_deform_attn_func.py:85) used as the parity oracle."""
    B, Lv, H, C = value.shape
    Lq = loc.shape[1]
    starts = np.cumsum([0] + [h * w_ for h, w_ in shapes[:-1]])
    out = np.zeros((B, Lq, H, C), np.float64)
    for lvl, (Hl, Wl) in enumerate(shapes):
        v = value[:, starts[lvl]:starts[lvl] + Hl * Wl].reshape(B, Hl, Wl, H, C)
        for b in range(B):
            for q in range(Lq):
                for h in range(H):
                    for p in range(loc.shape[4]):
                        x = loc[b, q, h, lvl, p, 0] * Wl - 0.5
                        y = loc[b, q, h, lvl, p, 1] * Hl - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        wx, wy = x - x0, y - y0
                        acc = np.zeros(C)
                        for dy, dx, ww in ((0, 0, (1 - wy) * (1 - wx)),
                                           (0, 1, (1 - wy) * wx),
                                           (1, 0, wy * (1 - wx)),
                                           (1, 1, wy * wx)):
                            yy, xx = y0 + dy, x0 + dx
                            if 0 <= yy < Hl and 0 <= xx < Wl:
                                acc += ww * v[b, yy, xx, h]
                        out[b, q, h] += w[b, q, h, lvl, p] * acc
    return out.reshape(B, Lq, H * C)


def test_ms_deform_attn_lax_matches_reference():
    rng = np.random.RandomState(0)
    shapes = ((6, 8), (3, 4))
    Lv = sum(h * w for h, w in shapes)
    B, Lq, H, C, P = 2, 5, 2, 4, 3
    value = rng.randn(B, Lv, H, C).astype(np.float32)
    loc = rng.uniform(0, 1, (B, Lq, H, len(shapes), P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, (B, Lq, H, len(shapes), P)).astype(np.float32)
    w /= w.sum((3, 4), keepdims=True)

    out = np.asarray(ms_deform_attn_lax(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)))
    ref = _torch_reference(value, shapes, loc, w)
    assert np.abs(out - ref).max() < 1e-4


def test_ms_deform_attn_grad_finite():
    rng = np.random.RandomState(0)
    shapes = ((4, 4),)
    value = jnp.asarray(rng.randn(1, 16, 2, 4), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.2, 0.8, (1, 3, 2, 1, 2, 2)), jnp.float32)
    w = jnp.full((1, 3, 2, 1, 2), 0.5, jnp.float32)

    def f(value, loc, w):
        return ms_deform_attn_lax(value, shapes, loc, w).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


@pytest.fixture(scope="module")
def tiny_deformable():
    model = DeformableDETR(
        num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
        num_encoder_layers=2, num_decoder_layers=2, dim_feedforward=128,
        num_feature_levels=4, stage_sizes=(1, 1, 1, 1), with_box_refine=True)
    images = jnp.zeros((2, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), images)
    return model, params


def test_deformable_forward_shapes(tiny_deformable):
    model, params = tiny_deformable
    images = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3),
                         jnp.float32)
    mask = jnp.zeros((2, 64, 96))
    out = jax.jit(lambda p, x, m: model.apply(p, x, m))(params, images, mask)
    assert out["pred_logits"].shape == (2, 20, 10)  # focal: no bg class
    assert out["pred_boxes"].shape == (2, 20, 4)
    assert len(out["aux_outputs"]) == 1
    b = np.asarray(out["pred_boxes"])
    assert b.min() >= 0 and b.max() <= 1


@pytest.mark.slow
def test_deformable_criterion_and_grad(tiny_deformable):
    model, params = tiny_deformable
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32)
    targets = {
        "boxes": jnp.asarray(np.clip(rng.uniform(0.3, 0.7, (2, 5, 4)),
                                     0.05, 0.95).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 10, (2, 5)).astype(np.int32)),
        "valid": jnp.asarray(np.arange(5)[None] < np.array([[2], [5]])),
    }

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, images)
        return deformable_criterion(out, targets)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    gsum = jax.tree.reduce(lambda a, b: a + b,
                           jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert np.isfinite(gsum) and gsum > 0


def test_deformable_inference_threshold(tiny_deformable):
    from aloception_tpu.aloscene import BoundingBoxes2D
    model, params = tiny_deformable
    out = model.apply(params, jnp.zeros((1, 64, 96, 3)))
    boxes = inference(jax.device_get(out), threshold=0.99)
    assert len(boxes) == 1 and isinstance(boxes[0], BoundingBoxes2D)
    boxes_low = inference(jax.device_get(out), threshold=0.0)
    assert boxes_low[0].shape[0] >= boxes[0].shape[0]


def test_deformable_train_step_learns():
    """~40 fp32 steps on a fixed 2-box scene must cut the loss by >35% and
    teach matched queries their target classes (sigmoid/focal head) —
    the deformable analog of the DETR learning regression in
    test_trainer.py (bf16 query collapse, DEVELOPMENT.md)."""
    import optax
    from aloception_tpu.models.deformable_detr import focal_hungarian_match
    from aloception_tpu.train.state import make_train_state, make_optimizer

    H, W = 64, 64
    img = np.full((1, H, W, 3), 0.4, np.float32)
    img[0, 8:24, 4:28] = [0.9, 0.1, 0.1]
    img[0, 40:60, 36:60] = [0.1, 0.2, 0.9]
    targets = {
        "boxes": jnp.asarray([[[16 / W, 16 / H, 24 / W, 16 / H],
                               [48 / W, 50 / H, 24 / W, 20 / H]]], jnp.float32),
        "labels": jnp.asarray([[0, 2]], jnp.int32),
        "valid": jnp.asarray([[True, True]]),
    }
    model = DeformableDETR(
        num_classes=4, hidden_dim=32, num_queries=8, nheads=4,
        num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=64,
        num_feature_levels=4, stage_sizes=(1, 1, 1, 1), with_box_refine=True,
        dropout=0.0)
    images = jnp.asarray(img)
    params = model.init(jax.random.PRNGKey(0), images)
    tx = make_optimizer(lr=1e-3, lr_backbone=1e-3, weight_decay=1e-4,
                        grad_clip=0.1)
    state = make_train_state(model, params, tx=tx)

    @jax.jit
    def step(state):
        def loss_fn(p):
            out = model.apply(p, images)
            loss, _ = deformable_criterion(out, targets)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss0 = step(state)
    for _ in range(40):
        state, loss = step(state)
    assert float(loss) < 0.65 * float(loss0), (loss0, loss)

    out = jax.jit(lambda p: model.apply(p, images))(state.params)
    matched, _ = focal_hungarian_match(out, targets)
    q = np.asarray(matched)[0]
    assert q[0] != q[1]
    probs = jax.nn.sigmoid(np.asarray(out["pred_logits"])[0])
    # each matched query ranks its own class above the others
    for t, lbl in enumerate((0, 2)):
        assert probs[q[t]].argmax() == lbl, (t, probs[q[t]])
