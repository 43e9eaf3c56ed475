"""RAFT model, correlation ops, sequence loss (mirrors reference
alonet/raft semantics; corr parity mirrors corr.py:12-60)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.ops.correlation import corr_volume, corr_pyramid, corr_lookup
from aloception_tpu.ops.warp import bilinear_sample, coords_grid, warp
from aloception_tpu.models.raft import (
    RAFT, raft_small, raft_sequence_loss, Padder, convex_upsample)


def test_bilinear_sample_exact_on_grid():
    img = jnp.asarray(np.random.RandomState(0).randn(6, 8, 3), jnp.float32)
    xs = jnp.asarray([[1.0, 2.0], [0.0, 7.0]])
    ys = jnp.asarray([[0.0, 3.0], [5.0, 5.0]])
    out = bilinear_sample(img, xs, ys)
    assert np.allclose(out[0, 0], img[0, 1], atol=1e-6)
    assert np.allclose(out[1, 1], img[5, 7], atol=1e-6)
    # halfway interpolation
    mid = bilinear_sample(img, jnp.asarray([0.5]), jnp.asarray([0.0]))
    assert np.allclose(mid[0], (img[0, 0] + img[0, 1]) / 2, atol=1e-6)
    # out of range -> 0
    oob = bilinear_sample(img, jnp.asarray([-2.0]), jnp.asarray([0.0]))
    assert np.allclose(oob, 0.0)


def test_warp_identity_and_shift():
    img = jnp.asarray(np.random.RandomState(0).randn(8, 8, 2), jnp.float32)
    out = warp(img, jnp.zeros((8, 8, 2)))
    assert np.allclose(out, img, atol=1e-5)
    shift = jnp.ones((8, 8, 2)) * jnp.asarray([1.0, 0.0])
    out = warp(img, shift)
    assert np.allclose(out[:, :7], img[:, 1:], atol=1e-5)


def test_corr_volume_matches_naive():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 4, 6, 16).astype(np.float32)
    f2 = rng.randn(2, 4, 6, 16).astype(np.float32)
    corr = np.asarray(corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    naive = np.einsum("bijc,bklc->bijkl", f1, f2).reshape(2, 24, 4, 6) / 4.0
    assert np.abs(corr - naive).max() < 1e-4


def test_corr_lookup_center_equals_volume():
    """Lookup at the identity coords with delta (0,0) must return the
    volume's value at the query pixel itself."""
    rng = np.random.RandomState(1)
    f1 = rng.randn(1, 8, 8, 8).astype(np.float32)
    f2 = rng.randn(1, 8, 8, 8).astype(np.float32)
    vol = corr_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr_pyramid(vol, num_levels=2)
    coords = coords_grid(8, 8)[None]
    out = np.asarray(corr_lookup(pyr, coords, radius=1))
    assert out.shape == (1, 8, 8, 2 * 9)
    # center tap of level 0 window = corr[n, y, x] at the pixel's own coords
    vol_np = np.asarray(vol).reshape(8, 8, 8, 8)
    center = out[0, :, :, 4]  # middle of 3x3 at level 0
    expected = vol_np[np.arange(8)[:, None], np.arange(8)[None, :],
                      np.arange(8)[:, None], np.arange(8)[None, :]]
    assert np.abs(center - expected).max() < 1e-4


def test_convex_upsample_constant_flow():
    flow = jnp.ones((1, 4, 4, 2))
    mask = jnp.zeros((1, 4, 4, 64 * 9))
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (1, 32, 32, 2)
    # uniform mask (softmax of zeros) on constant flow -> constant 8x flow
    inner = up[0, 8:-8, 8:-8]
    assert np.allclose(inner, 8.0, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_raft():
    model = RAFT(hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
    f1 = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), f1, f1, iters=2)
    return model, params


def test_raft_forward_shapes(tiny_raft):
    model, params = tiny_raft
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    flows = jax.jit(lambda p, a, b: model.apply(p, a, b, iters=3))(params, f1, f2)
    assert len(flows) == 3
    assert flows[-1].shape == (1, 64, 64, 2)


def test_raft_only_last_matches_final_flow(tiny_raft):
    """only_last=True takes the restructured inference path (scan without
    the mask head + one final masked step, raft.py round-5) — in f32 it must
    reproduce flows[-1] of the reference-shaped all-flows path exactly
    (modulo compile scheduling)."""
    model, params = tiny_raft
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    flows = jax.jit(lambda p, a, b: model.apply(p, a, b, iters=3))(
        params, f1, f2)
    last = jax.jit(lambda p, a, b: model.apply(p, a, b, iters=3,
                                               only_last=True))(
        params, f1, f2)
    assert last.shape == flows[-1].shape
    scale = float(jnp.max(jnp.abs(flows[-1]))) + 1e-9
    rel = float(jnp.max(jnp.abs(last - flows[-1]))) / scale
    assert rel < 1e-5, rel
    # iters=1: the fast path skips the scan entirely
    one = model.apply(params, f1, f2, iters=1, only_last=True)
    assert one.shape == last.shape


def test_raft_sequence_loss_and_grad(tiny_raft):
    model, params = tiny_raft
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.randn(1, 64, 64, 2), jnp.float32)

    @jax.jit
    def loss_fn(p):
        flows = model.apply(p, f1, f2, iters=2)
        loss, metrics = raft_sequence_loss(flows, gt)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert "epe" in metrics and np.isfinite(float(metrics["epe"]))
    gsum = jax.tree.reduce(lambda a, b: a + b,
                           jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads))
    assert gsum > 0


def test_raft_learns_constant_flow():
    """Few gradient steps on a synthetic constant-translation pair should
    reduce EPE (end-to-end learnability check)."""
    import optax
    model = RAFT(hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
    rng = np.random.RandomState(0)
    base = rng.uniform(-1, 1, (1, 72, 72, 3)).astype(np.float32)
    f1 = jnp.asarray(base[:, 4:68, 4:68])
    f2 = jnp.asarray(base[:, 4:68, 2:66])  # content moved right by 2 px
    gt = jnp.broadcast_to(jnp.asarray([2.0, 0.0]), (1, 64, 64, 2))

    params = model.init(jax.random.PRNGKey(0), f1, f2, iters=2)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            flows = model.apply(p, f1, f2, iters=2)
            return raft_sequence_loss(flows, gt)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    params, opt_state, m0 = step(params, opt_state)
    for _ in range(8):
        params, opt_state, m = step(params, opt_state)
    assert float(m["epe"]) < float(m0["epe"])


def test_raft_small_builds():
    model = raft_small()
    f = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), f, f, iters=1)
    flows = model.apply(params, f, f, iters=1)
    assert flows[-1].shape == (1, 64, 64, 2)


def test_padder():
    x = jnp.zeros((1, 70, 99, 3))
    p = Padder(x.shape)
    xp = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    assert p.unpad(xp).shape == x.shape


def test_corr_lookup_onehot_matches_corr_lookup():
    """corr_lookup_onehot is RAFT's default lookup (the gather-free MXU
    reformulation, correlation.py:168); parity vs corr_lookup on random +
    out-of-range coords, forward and gradient."""
    from aloception_tpu.ops.correlation import corr_lookup_onehot

    rng = np.random.RandomState(2)
    f1 = rng.randn(2, 8, 12, 8).astype(np.float32)
    f2 = rng.randn(2, 8, 12, 8).astype(np.float32)
    vol = corr_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr_pyramid(vol, num_levels=3)
    # coords straddling the borders (incl. fully out of range)
    coords = jnp.asarray(
        rng.uniform(-3, 15, (2, 8, 12, 2)).astype(np.float32))

    ref = np.asarray(corr_lookup(pyr, coords, radius=3))
    got = np.asarray(corr_lookup_onehot(pyr, coords, radius=3))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-5, np.abs(got - ref).max()

    # gradient parity wrt pyramid AND coords
    def loss_ref(p, c):
        return (corr_lookup(p, c, radius=3) ** 2).sum()

    def loss_one(p, c):
        return (corr_lookup_onehot(p, c, radius=3) ** 2).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(pyr, coords)
    g_one = jax.grad(loss_one, argnums=(0, 1))(pyr, coords)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_one)):
        scale = max(1.0, float(jnp.abs(a).max()))
        assert float(jnp.abs(a - b).max()) / scale < 2e-5
