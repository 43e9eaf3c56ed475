"""Pallas kernels vs their lax references (interpret mode on CPU;
the driver's real-TPU bench exercises the compiled path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

def _msda_inputs(Lq=50, seed=0):
    rng = np.random.RandomState(seed)
    B, nH, C, L, P = 2, 8, 32, 4, 4
    shapes = ((16, 20), (8, 10), (4, 5), (2, 3))
    Len_v = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)
    # some locations deliberately out of [0,1] to exercise zero padding
    loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2) * 1.2 - 0.1, jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Lq, nH, L, P), jnp.float32)
        .reshape(B, Lq, nH, -1), -1).reshape(B, Lq, nH, L, P)
    return value, shapes, loc, w


def test_ms_deform_attn_pallas_parity():
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)
    value, shapes, loc, w = _msda_inputs()
    want = ms_deform_attn_lax(value, shapes, loc, w)
    got = ms_deform_attn(value, shapes, loc, w, impl="pallas")
    assert got.shape == want.shape
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_ms_deform_attn_pallas_grad_parity():
    """The pallas impl's custom VJP must match the lax gradients (the
    reference tests CUDA grads against pytorch the same way, ops/test.py)."""
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)
    value, shapes, loc, w = _msda_inputs(Lq=20, seed=1)

    def loss(impl):
        def f(v, l, a):
            out = ms_deform_attn(v, shapes, l, a, impl=impl)
            return jnp.sum(out * out)
        return f

    g_ref = jax.grad(loss("lax"), argnums=(0, 1, 2))(value, loc, w)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(value, loc, w)
    for a, b in zip(g_ref, g_pal):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_ms_deform_attn_block_parity_and_grad():
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)
    # includes a degenerate (1, 3) level to exercise the gather fallback
    rng = np.random.RandomState(2)
    B, nH, C, P = 2, 4, 16, 4
    shapes = ((12, 16), (6, 8), (3, 4), (1, 3))
    Len_v = sum(h * w for h, w in shapes)
    Lq = 33
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, nH, 4, P, 2) * 1.4 - 0.2, jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, nH, 4, P), jnp.float32).reshape(B, Lq, nH, -1),
        -1).reshape(B, Lq, nH, 4, P)
    want = ms_deform_attn_lax(value, shapes, loc, w)
    got = ms_deform_attn(value, shapes, loc, w, impl="block")
    assert float(jnp.abs(got - want).max()) < 1e-5
    g1 = jax.grad(lambda v: jnp.sum(
        ms_deform_attn_lax(v, shapes, loc, w) ** 2))(value)
    g2 = jax.grad(lambda v: jnp.sum(
        ms_deform_attn(v, shapes, loc, w, impl="block") ** 2))(value)
    assert float(jnp.abs(g1 - g2).max()) < 1e-4


def test_ms_deform_attn_pallas_bwd_out_of_range_locations():
    """The pallas custom-VJP backward (block autodiff) must zero gradients
    for out-of-bounds corners exactly like autodiff of the lax reference
    (validity masking), including the query-padding tail."""
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)
    rng = np.random.RandomState(7)
    B, nH, C, P = 2, 2, 8, 4
    shapes = ((8, 8), (4, 4))
    Len_v = sum(h * w for h, w in shapes)
    Lq = 70  # > tile_q=64: exercises query padding in fwd AND bwd
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, nH, 2, P, 2) * 1.6 - 0.3, jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, nH, 2, P), jnp.float32).reshape(B, Lq, nH, -1),
        -1).reshape(B, Lq, nH, 2, P)

    def loss(impl):
        def f(v, l, a):
            out = (ms_deform_attn(v, shapes, l, a, impl=impl) if impl
                   else ms_deform_attn_lax(v, shapes, l, a))
            return jnp.sum(jnp.sin(out))
        return f

    g_ref = jax.grad(loss(None), argnums=(0, 1, 2))(value, loc, w)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(value, loc, w)
    for name, a, b in zip(("dvalue", "dloc", "dw"), g_ref, g_pal):
        scale = max(float(jnp.abs(a).max()), 1.0)
        assert float(jnp.abs(a - b).max()) / scale < 1e-5, name


def test_ms_deform_attn_pallas_oob_and_padding_parity():
    """The kernel must match the lax oracle including out-of-range
    locations and the query-padding tail (interpret mode; the hardware
    gate covers the real lowering). A prep='fused' in-kernel corner-math
    variant passed this same check in round 4 but LOST end-to-end on
    hardware (678 vs 583 ms deformable bs16) and was deleted."""
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        ms_deform_attn_pallas)
    rng = np.random.RandomState(11)
    B, nH, C, P = 2, 2, 8, 4
    shapes = ((8, 8), (4, 4))
    Len_v = sum(h * w for h, w in shapes)
    Lq = 70  # > Tq: exercises padding
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, nH, 2, P, 2) * 1.6 - 0.3, jnp.float32)
    w = jnp.asarray(rng.rand(B, Lq, nH, 2, P), jnp.float32)
    want = ms_deform_attn_lax(value, shapes, loc, w)
    got = ms_deform_attn_pallas(value, shapes, loc, w, 64, True)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_msda_tile_q_picked_by_level0_area():
    """ADVICE r4: Tq=128 was only VMEM-validated at 640px (level-0 80x80);
    the kernel's per-program VMEM scales with Tq * level-0 area, so the
    large multi-scale buckets (max-side 1333 -> level-0 up to ~104x168)
    must fall back to the compile-proven Tq=64."""
    from aloception_tpu.ops.ms_deform_attn import _pick_tile_q
    assert _pick_tile_q(((80, 80), (40, 40), (20, 20), (10, 10))) == 128
    assert _pick_tile_q(((46, 62), (23, 31), (12, 16), (6, 8))) == 128
    # the geometry-demo bucket ladder (stride-8 level 0)
    assert _pick_tile_q(((88, 120), (44, 60), (22, 30), (11, 15))) == 64
    assert _pick_tile_q(((104, 168), (52, 84), (26, 42), (13, 21))) == 64
