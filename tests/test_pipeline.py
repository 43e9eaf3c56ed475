"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over the
mesh's pp axis must be numerically identical to running the layer stack
sequentially — forward AND grads (autodiff through ppermute/scan).

Runs on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp

from aloception_tpu.models.detr.transformer import EncoderLayer
from aloception_tpu.parallel import (make_mesh, gpipe, stack_layer_params,
                                     extract_layer_stack, shard_layer_stack)

D, HEADS, FFN, NLAYERS = 32, 4, 64, 4
B, L = 8, 12


def _setup():
    layer = EncoderLayer(d_model=D, nheads=HEADS, dim_feedforward=FFN,
                         dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    mask = jnp.zeros((B, L), jnp.float32)
    params = [
        layer.init(jax.random.PRNGKey(i), x, pos, mask)["params"]
        for i in range(NLAYERS)
    ]
    return layer, x, pos, mask, params


def _layer_apply(layer):
    return lambda p, a, ex: layer.apply({"params": p}, a, ex["pos"],
                                        ex["mask"])


def _sequential(layer, params, x, pos, mask):
    for p in params:
        x = layer.apply({"params": p}, x, pos, mask)
    return x


def test_gpipe_forward_matches_sequential():
    layer, x, pos, mask, params = _setup()
    want = np.asarray(_sequential(layer, params, x, pos, mask))

    mesh = make_mesh(n_devices=8, pp=2)          # dp=4, pp=2
    stacked = shard_layer_stack(stack_layer_params(params), mesh)
    got = gpipe(_layer_apply(layer), stacked, x,
                {"pos": pos, "mask": mask}, mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gpipe_full_pipeline_no_dp():
    """pp=4 (one layer per stage), dp=1: the deepest pipeline."""
    layer, x, pos, mask, params = _setup()
    want = np.asarray(_sequential(layer, params, x, pos, mask))
    mesh = make_mesh(n_devices=8, pp=4, tp=2)    # dp=1, pp=4, tp=2
    stacked = shard_layer_stack(stack_layer_params(params), mesh)
    got = gpipe(_layer_apply(layer), stacked, x,
                {"pos": pos, "mask": mask}, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gpipe_grads_match_sequential():
    """Backprop through the pipeline (scan + ppermute transpose) must give
    the same layer grads as the sequential stack — pipelined TRAINING, not
    just inference."""
    layer, x, pos, mask, params = _setup()
    apply_one = _layer_apply(layer)

    def loss_seq(stacked):
        a = x
        for i in range(NLAYERS):
            p = jax.tree.map(lambda t: t[i], stacked)
            a = apply_one(p, a, {"pos": pos, "mask": mask})
        return (a ** 2).sum()

    stacked_host = stack_layer_params(params)
    g_want = jax.grad(loss_seq)(stacked_host)

    mesh = make_mesh(n_devices=8, pp=2)

    def loss_pp(stacked):
        out = gpipe(apply_one, stacked, x, {"pos": pos, "mask": mask},
                    mesh, n_micro=2)
        return (out ** 2).sum()

    g_got = jax.grad(loss_pp)(shard_layer_stack(stacked_host, mesh))
    flat_w, _ = jax.tree_util.tree_flatten(g_want)
    flat_g, _ = jax.tree_util.tree_flatten(g_got)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=5e-5)


def test_extract_layer_stack_from_model_params():
    """extract_layer_stack pulls the real Transformer's encoder_layer{i}
    subtrees so a trained checkpoint can be pipelined without re-init."""
    from aloception_tpu.models.detr.transformer import Transformer
    tr = Transformer(d_model=D, nheads=HEADS, num_encoder_layers=2,
                     num_decoder_layers=2, dim_feedforward=FFN, dropout=0.0)
    rng = np.random.RandomState(1)
    src = jnp.asarray(rng.randn(2, L, D).astype(np.float32))
    pos = jnp.asarray(rng.randn(2, L, D).astype(np.float32))
    q = jnp.asarray(rng.randn(5, D).astype(np.float32))
    variables = tr.init(jax.random.PRNGKey(0), src, pos, q)
    stacked = extract_layer_stack(variables, "encoder_layer", 2)
    lin1 = stacked["linear1"]["kernel"]
    assert lin1.shape == (2, D, FFN)
    np.testing.assert_array_equal(
        np.asarray(lin1[1]),
        np.asarray(variables["params"]["encoder_layer1"]["linear1"]["kernel"]))
