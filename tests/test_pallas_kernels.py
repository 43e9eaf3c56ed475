"""Pallas kernels vs their lax references (interpret mode on CPU;
the driver's real-TPU bench exercises the compiled path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.ops.pallas import corr_volume_pyramid_pallas
from aloception_tpu.ops.correlation import corr_volume, corr_pyramid


@pytest.mark.parametrize("shape", [(2, 8, 16, 32), (1, 6, 24, 64)])
def test_corr_pyramid_kernel_parity(shape):
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(*shape), jnp.float32)
    f2 = jnp.asarray(rng.randn(*shape), jnp.float32)
    ref = corr_pyramid(corr_volume(f1, f2), num_levels=3)
    out = corr_volume_pyramid_pallas(f1, f2, num_levels=3, interpret=True)
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_corr_pyramid_kernel_odd_level_dims():
    """Odd intermediate dims floor exactly like the reference pooling."""
    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.randn(1, 10, 16, 16), jnp.float32)  # 10 -> 5 -> 2
    f2 = jnp.asarray(rng.randn(1, 10, 16, 16), jnp.float32)
    ref = corr_pyramid(corr_volume(f1, f2), num_levels=3)
    out = corr_volume_pyramid_pallas(f1, f2, num_levels=3, interpret=True)
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        assert float(jnp.abs(a - b).max()) < 1e-5
