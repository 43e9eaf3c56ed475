"""Fused on-device preprocessing (ops/preprocess.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.ops.preprocess import fused_preprocess, RESNET_MEAN, RESNET_STD


def test_normalization_matches_frame_path():
    from aloception_tpu.aloscene import Frame
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, 32, 40, 3), np.uint8)
    out, mask = fused_preprocess(jnp.asarray(img), dtype=jnp.float32)
    f = Frame(img[0].transpose(2, 0, 1).astype(np.float32)).norm_resnet()
    ref = np.asarray(f.as_layout(("H", "W", "C")))
    assert np.abs(np.asarray(out[0]) - ref).max() < 1e-4
    assert mask.shape == (1, 32, 40)


def test_resize_and_dtype():
    img = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    out, mask = fused_preprocess(img, out_size=(32, 48))
    assert out.shape == (2, 32, 48, 3) and out.dtype == jnp.bfloat16
    assert mask.shape == (2, 32, 48)


def test_train_augmentations_random_but_deterministic():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (4, 16, 16, 3), np.uint8))
    k = jax.random.PRNGKey(0)
    a1, _ = fused_preprocess(img, k, train=True, dtype=jnp.float32)
    a2, _ = fused_preprocess(img, k, train=True, dtype=jnp.float32)
    assert np.allclose(np.asarray(a1), np.asarray(a2))  # same key -> same aug
    b, _ = fused_preprocess(img, jax.random.PRNGKey(1), train=True,
                            dtype=jnp.float32)
    assert not np.allclose(np.asarray(a1), np.asarray(b))  # diff key -> diff


def test_whole_thing_is_one_jit():
    img = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    # second call with same shapes must hit the jit cache (no retrace error)
    fused_preprocess(img, dtype=jnp.float32)
    fused_preprocess(img, dtype=jnp.float32)
