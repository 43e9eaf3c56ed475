"""Trainer harness: fit/validate/checkpoint/resume on a tiny model
(the run_pl_training contract, pl_helpers.py:295)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.models.detr import Detr
from aloception_tpu.train import (CocoDetection2Detr, make_detr_trainer,
                                  MetricsCallback, CheckpointManager)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    dm = CocoDetection2Detr(sample=True, size=(64, 96), batch_size=4)
    model = Detr(num_classes=len(dm.label_names), hidden_dim=32,
                 num_queries=8, nheads=4, num_encoder_layers=1,
                 num_decoder_layers=1, dim_feedforward=32,
                 stage_sizes=(1, 1, 1, 1))
    log_dir = str(tmp_path_factory.mktemp("expe"))
    return dm, model, log_dir


def test_fit_and_checkpoint(tiny_setup):
    dm, model, log_dir = tiny_setup
    trainer = make_detr_trainer(
        model=model, data_module=dm, log_dir=log_dir,
        callbacks=[MetricsCallback()], limit_train_batches=1,
        limit_val_batches=1, accumulate_grad_batches=1)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=1)
    assert trainer.global_step == 1
    assert "val_loss_total" in trainer.last_val_metrics
    assert trainer.ckpt.last_step() == 1
    # registry carries the monitored metric
    assert trainer.ckpt._registry["1"]["val_loss_total"] == pytest.approx(
        trainer.last_val_metrics["val_loss_total"], rel=1e-5)


def test_resume_continues(tiny_setup):
    dm, model, log_dir = tiny_setup
    t1 = make_detr_trainer(
        model=model, data_module=dm, log_dir=log_dir, expe_name="resume",
        run_id="fixed", callbacks=[MetricsCallback()],
        limit_train_batches=1, limit_val_batches=1,
        accumulate_grad_batches=1)
    t1.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=1)
    t2 = make_detr_trainer(
        model=model, data_module=dm, log_dir=log_dir, expe_name="resume",
        run_id="fixed", callbacks=[MetricsCallback()],
        limit_train_batches=1, limit_val_batches=1,
        accumulate_grad_batches=1)
    t2.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=1,
           resume=True)
    assert t2.ckpt.last_step() == 2  # continued past step 1


def test_checkpoint_best_pruning(tmp_path):
    cm = CheckpointManager(str(tmp_path), monitor="val_loss", mode="min",
                           save_top_k=1, save_last=True)
    state = {"w": jnp.ones((4,))}
    cm.save(1, state, {"val_loss": 3.0})
    cm.save(2, state, {"val_loss": 1.0})   # best
    cm.save(3, state, {"val_loss": 2.0})   # last
    assert cm.best_step() == 2
    assert cm.last_step() == 3
    kept = {int(s) for s in cm._registry}
    assert kept == {2, 3}  # step 1 pruned
    restored = cm.restore({"w": jnp.zeros((4,))}, best=True)
    assert np.allclose(restored["w"], 1.0)


def test_frozen_bn_params_never_update():
    """Regression: optax.masked passes unmasked updates through UNCHANGED, so
    frozen-BN leaves must be explicitly zeroed or they get the raw clipped
    gradient (advisor round-1, train/state.py)."""
    from aloception_tpu.train.state import make_optimizer

    params = {
        "backbone": {"bn_init": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                     "conv": {"kernel": jnp.ones((3, 3, 4, 4))}},
        "head": {"kernel": jnp.ones((4, 4))},
    }
    tx = make_optimizer(lr=1e-4, lr_backbone=1e-5, grad_clip=0.1)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # frozen BN: exactly zero update
    assert float(jnp.abs(updates["backbone"]["bn_init"]["scale"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["bn_init"]["bias"]).max()) == 0.0
    # trainable leaves: non-zero updates
    assert float(jnp.abs(updates["head"]["kernel"]).max()) > 0.0
    assert float(jnp.abs(updates["backbone"]["conv"]["kernel"]).max()) > 0.0
    # backbone LR group is ~10x smaller than head group
    h = float(jnp.abs(updates["head"]["kernel"]).mean())
    b = float(jnp.abs(updates["backbone"]["conv"]["kernel"]).mean())
    assert b < h


def test_multiscale_bucketed_geometry():
    """Multi-scale mode pads every batch to one of the canonical buckets
    (bounded recompilation) and defaults match the reference scales
    (data2detr.py:153)."""
    from aloception_tpu.train.data_modules import (
        CocoDetection2Detr, MULTISCALE_BUCKETS, REFERENCE_SCALES, pick_bucket)
    from aloception_tpu.aloscene import Frame

    assert REFERENCE_SCALES[0] == 480 and REFERENCE_SCALES[-1] == 800

    # pick_bucket covers every legal post-aug shape with a bucket shape
    rng = np.random.RandomState(0)
    shapes = set()
    for _ in range(200):
        short = rng.randint(480, 801)
        long = rng.randint(short, 1334)
        h, w = (short, long) if rng.rand() < 0.5 else (long, short)
        bh, bw = pick_bucket(h, w)
        assert bh >= h and bw >= w
        assert (min(bh, bw), max(bh, bw)) in MULTISCALE_BUCKETS
        shapes.add((bh, bw))
    assert len(shapes) <= 2 * len(MULTISCALE_BUCKETS)

    from aloception_tpu.aloscene import BoundingBoxes2D, Labels

    def make_frame(h, w):
        f = Frame(np.zeros((3, h, w), np.float32)).norm_resnet()
        f.append_boxes2d(BoundingBoxes2D(
            np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), "xcyc", False,
            frame_size=(h, w),
            labels=Labels(np.array([1.0], np.float32))))
        return f

    dm = CocoDetection2Detr(sample=True, size=None)
    frames = [make_frame(500, 640), make_frame(480, 720)]
    out = dm.prepare_batch(frames)
    images, mask = out["inputs"]
    assert (min(images.shape[1:3]), max(images.shape[1:3])) \
        in MULTISCALE_BUCKETS
    # padded area is masked
    assert mask[0, 510, 10] == 1.0 and mask[0, 100, 100] == 0.0


def test_train_step_learns_and_differentiates_queries():
    """Regression for the bf16 query-collapse bug: ~40 fp32 steps on a
    2-box scene must (a) cut the loss by >40% and (b) leave the two matched
    queries predicting DISTINCT boxes. Under bf16 activations every query
    converges to the same box and the loss plateaus (DEVELOPMENT.md,
    'Training precision'); fp32 passes this easily."""
    import optax
    from aloception_tpu.models.detr.criterion import detr_criterion
    from aloception_tpu.models.detr.matcher import hungarian_match
    from aloception_tpu.train.state import make_train_state, make_optimizer

    H = W = 64
    img = np.full((1, H, W, 3), 0.4, np.float32)
    img[0, 8:24, 4:28] = [0.9, 0.1, 0.1]
    img[0, 40:60, 36:60] = [0.1, 0.2, 0.9]
    targets = {
        "boxes": jnp.asarray([[[16 / W, 16 / H, 24 / W, 16 / H],
                               [48 / W, 50 / H, 24 / W, 20 / H]]], jnp.float32),
        "labels": jnp.asarray([[0, 2]], jnp.int32),
        "valid": jnp.asarray([[True, True]]),
    }
    model = Detr(num_classes=4, hidden_dim=32, num_queries=8, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, stage_sizes=(1, 1, 1, 1), dropout=0.0)
    images = jnp.asarray(img)
    mask = jnp.zeros((1, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, mask)
    tx = make_optimizer(lr=1e-3, lr_backbone=1e-3, weight_decay=1e-4,
                        grad_clip=0.1)
    state = make_train_state(model, params, tx=tx)

    @jax.jit
    def step(state):
        def loss_fn(p):
            out = model.apply(p, images, mask)
            loss, _ = detr_criterion(out, targets)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    state, loss0 = step(state)
    for _ in range(40):
        state, loss = step(state)
    assert float(loss) < 0.6 * float(loss0), (loss0, loss)

    out = jax.jit(lambda p: model.apply(p, images, mask))(state.params)
    matched, _ = hungarian_match(out, targets)
    q0, q1 = np.asarray(matched)[0]
    b0 = np.asarray(out["pred_boxes"])[0, q0]
    b1 = np.asarray(out["pred_boxes"])[0, q1]
    assert q0 != q1
    # distinct queries must predict distinct boxes (collapse => ~identical)
    assert np.abs(b0 - b1).sum() > 0.1, (b0, b1)


def test_onecycle_schedule_shape():
    """OneCycleLR analog (state.py onecycle_schedule) matches the torch
    linear-anneal shape the reference trains RAFT with
    (alonet/raft/train.py:79-86): warmup peak/25 -> peak over 5%, then
    linear anneal to peak/25/1e4."""
    from aloception_tpu.train import onecycle_schedule
    peak, total = 4e-4, 1000
    s = onecycle_schedule(peak, total, pct_start=0.05)
    assert abs(float(s(0)) - peak / 25) < 1e-9
    assert abs(float(s(50)) - peak) < 1e-8
    assert float(s(total)) <= peak / 25 / 1e3
    # monotone up then down, clamped past the end
    assert float(s(25)) > float(s(0))
    assert float(s(500)) < float(s(50))
    assert float(s(total + 500)) == float(s(total))


def test_steps_per_dispatch_matches_sequential(tiny_setup):
    """steps_per_dispatch=2 (scan-blocked dispatch, one metric fetch per
    block) must produce the same trained params as per-step dispatch on
    the same batch sequence."""
    dm, model, log_dir = tiny_setup
    batches = []
    loader = dm.train_dataloader()
    it = iter(loader)
    while len(batches) < 4:  # sample set is tiny: cycle the loader
        try:
            batches.append(next(it))
        except StopIteration:
            it = iter(loader)

    def run(k):
        t = make_detr_trainer(
            model=model, data_module=dm, log_dir=log_dir,
            expe_name=f"blockk{k}", callbacks=[MetricsCallback()],
            limit_train_batches=4, steps_per_dispatch=k)
        t.fit(batches, None, max_epochs=1)
        assert t.global_step == 4
        return jax.device_get(t.state.params)

    p1 = run(1)
    p2 = run(2)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
