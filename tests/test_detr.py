"""DETR model + matcher + criterion (mirrors reference alonet/detr tests and
the training-step contract of alonet/detr/train.py:129)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.models.detr import (
    Detr, detr_r50, inference, detr_criterion, hungarian_match,
    targets_from_frames)


@pytest.fixture(scope="module")
def small_detr():
    """Tiny DETR (2+2 layers, r18-ish trunk) for fast CPU tests."""
    model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                 num_encoder_layers=2, num_decoder_layers=2,
                 dim_feedforward=128, stage_sizes=(1, 1, 1, 1))
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, 64, 96, 3))
    params = model.init(rng, images)
    return model, params


def _targets(B=2, Nt=5, num_classes=10, seed=0):
    rng = np.random.RandomState(seed)
    xc = rng.uniform(0.3, 0.7, (B, Nt)).astype(np.float32)
    yc = rng.uniform(0.3, 0.7, (B, Nt)).astype(np.float32)
    w = rng.uniform(0.05, 0.2, (B, Nt)).astype(np.float32)
    h = rng.uniform(0.05, 0.2, (B, Nt)).astype(np.float32)
    counts = (np.arange(B) % Nt) + max(1, Nt - 2)
    return {
        "boxes": np.stack([xc, yc, w, h], -1),
        "labels": rng.randint(0, num_classes, (B, Nt)).astype(np.int32),
        "valid": np.arange(Nt)[None, :] < np.minimum(counts, Nt)[:, None],
    }


def test_forward_shapes(small_detr):
    model, params = small_detr
    images = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3),
                         jnp.float32)
    mask = jnp.zeros((2, 64, 96))
    out = jax.jit(lambda p, x, m: model.apply(p, x, m))(params, images, mask)
    assert out["pred_logits"].shape == (2, 20, 11)
    assert out["pred_boxes"].shape == (2, 20, 4)
    assert len(out["aux_outputs"]) == 1  # num_decoder_layers - 1
    assert float(out["pred_boxes"].min()) >= 0
    assert float(out["pred_boxes"].max()) <= 1


def test_padding_mask_affects_output(small_detr):
    """Padded area must be masked out of attention (backbone.py:118 mask)."""
    model, params = small_detr
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 96, 3).astype(np.float32)
    # same valid content, different padding garbage
    img2 = img.copy()
    img2[:, :, 64:, :] = 99.0
    mask = np.zeros((1, 64, 96), np.float32)
    mask[:, :, 64:] = 1.0
    out1 = model.apply(params, jnp.asarray(img), jnp.asarray(mask))
    out2 = model.apply(params, jnp.asarray(img2), jnp.asarray(mask))
    # backbone convs still see the padded pixels (like the reference), but
    # attention does not: logits must be much closer than without masking
    out_nomask = model.apply(params, jnp.asarray(img2), jnp.zeros((1, 64, 96)))
    d_masked = float(jnp.abs(out1["pred_logits"] - out2["pred_logits"]).mean())
    d_nomask = float(jnp.abs(out1["pred_logits"] - out_nomask["pred_logits"]).mean())
    assert d_masked < d_nomask


def test_matcher_assigns_each_valid_target_uniquely(small_detr):
    model, params = small_detr
    images = jnp.zeros((2, 64, 96, 3))
    out = model.apply(params, images)
    targets = jax.tree.map(jnp.asarray, _targets())
    matched, valid = jax.jit(hungarian_match)(out, targets)
    matched, valid = np.asarray(matched), np.asarray(valid)
    for b in range(2):
        m = matched[b][valid[b]]
        assert len(set(m.tolist())) == len(m)  # one query per target
        assert (m >= 0).all() and (m < 20).all()


def test_criterion_and_grad(small_detr):
    model, params = small_detr
    targets = jax.tree.map(jnp.asarray, _targets())
    images = jnp.asarray(np.random.RandomState(1).randn(2, 64, 96, 3),
                         jnp.float32)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, images)
        loss, metrics = detr_criterion(out, targets)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        assert k in metrics
    gnorm = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_criterion_perfect_prediction_low_box_loss():
    """If predictions equal targets, box losses vanish."""
    t = _targets(B=1, Nt=3)
    t["valid"] = np.ones((1, 3), bool)
    Nq = 10
    logits = np.full((1, Nq, 11), -10.0, np.float32)
    logits[..., -1] = 10.0  # background everywhere
    boxes = np.tile(np.array([[0.9, 0.9, 0.01, 0.01]], np.float32), (1, Nq, 1))
    # plant the 3 targets on queries 2, 5, 7 with the right classes
    for q, ti in zip((2, 5, 7), range(3)):
        boxes[0, q] = t["boxes"][0, ti]
        logits[0, q, :] = -10.0
        logits[0, q, t["labels"][0, ti]] = 10.0
    out = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    tgt = {k: jnp.asarray(v) for k, v in t.items()}
    loss, metrics = detr_criterion(out, tgt, aux_loss=False)
    assert float(metrics["loss_bbox"]) < 1e-3
    assert float(metrics["loss_giou"]) < 1e-3
    assert float(metrics["loss_ce"]) < 1e-2
    assert float(metrics["cardinality_error"]) == 0.0


def test_inference_returns_aloscene_boxes(small_detr):
    from aloception_tpu.aloscene import BoundingBoxes2D
    model, params = small_detr
    out = model.apply(params, jnp.zeros((2, 64, 96, 3)))
    boxes = inference(out, background_class=10)
    assert len(boxes) == 2
    assert all(isinstance(b, BoundingBoxes2D) for b in boxes)
    for b in boxes:
        if b.shape[0]:
            assert b.labels.scores is not None


def test_targets_from_frames():
    from aloception_tpu.aloscene import Frame, BoundingBoxes2D, Labels
    import aloception_tpu.aloscene as aloscene
    f1 = Frame(np.zeros((3, 32, 40), np.float32), normalization="01")
    f1.append_boxes2d(BoundingBoxes2D(
        np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), "xcyc", False,
        labels=Labels(np.array([4.0], np.float32))))
    f2 = Frame(np.zeros((3, 28, 40), np.float32), normalization="01")
    f2.append_boxes2d(BoundingBoxes2D(
        np.array([[0.4, 0.4, 0.1, 0.1], [0.6, 0.6, 0.1, 0.1]], np.float32),
        "xcyc", False, labels=Labels(np.array([2.0, 3.0], np.float32))))
    batched = aloscene.batch_list([f1, f2])
    targets = targets_from_frames(batched, max_targets=8)
    assert targets["boxes"].shape == (2, 8, 4)
    assert targets["valid"].sum() == 3
    assert targets["labels"][0, 0] == 4
    assert targets["labels"][1, 1] == 3
