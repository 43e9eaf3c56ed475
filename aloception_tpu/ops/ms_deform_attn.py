"""Multi-scale deformable attention sampling (MSDeformAttn core op).

The reference implements this as a CUDA im2col extension
(/root/reference/alonet/deformable_detr/ops/src/cuda/ms_deform_im2col_cuda.cuh,
autograd wrapper ops/functions/ms_deform_attn_func.py:49) with a pure-torch
fallback ``ms_deform_attn_core_pytorch`` (ms_deform_attn_func.py:85). Here the
*reference semantics* are expressed in pure jnp (fully differentiable,
vmap/jit-friendly) as ``ms_deform_attn_lax``; ``ms_deform_attn`` dispatches to
the Pallas TPU kernel when available and falls back to the lax path.

Semantics (grid_sample align_corners=False, zero padding):
    out[b, q, h, :] = sum_{l, p} w[b, q, h, l, p] *
        bilinear(value_l[b, :, :, h, :], loc[b, q, h, l, p] * (W_l, H_l) - 0.5)

Shapes:
    value:              (B, Len_v, H, C)   flattened levels, Len_v = sum H_l*W_l
    value_spatial_shapes: static tuple ((H_0, W_0), ...)
    sampling_locations: (B, Len_q, H, L, P, 2) in [0, 1] (x, y)
    attention_weights:  (B, Len_q, H, L, P) softmax-normalized over (L, P)
Returns (B, Len_q, H * C).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_starts(shapes: Sequence[Tuple[int, int]]):
    starts = [0]
    for (h, w) in shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _sample_level(value_l, loc_xy, H_l: int, W_l: int):
    """Bilinear sample one level for all queries/heads/points.

    value_l: (B, H_l, W_l, H, C); loc_xy: (B, Lq, H, P, 2) in [0,1].
    Returns (B, Lq, H, P, C). align_corners=False: pix = loc * size - 0.5.
    """
    B, _, _, nH, C = value_l.shape
    x = loc_xy[..., 0] * W_l - 0.5
    y = loc_xy[..., 1] * H_l - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < W_l) & (yy >= 0) & (yy < H_l)
        xi = jnp.clip(xx, 0, W_l - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, H_l - 1).astype(jnp.int32)
        # gather per (batch, head): value_l (B, H_l, W_l, nH, C),
        # indices (B, Lq, nH, P)
        b_idx = jnp.arange(B)[:, None, None, None]
        h_idx = jnp.arange(nH)[None, None, :, None]
        v = value_l[b_idx, yi, xi, h_idx]          # (B, Lq, nH, P, C)
        return v * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def ms_deform_attn_lax(value, value_spatial_shapes, sampling_locations,
                       attention_weights):
    """Pure-lax reference (parity target for the Pallas kernel; mirrors
    ms_deform_attn_core_pytorch, ms_deform_attn_func.py:85)."""
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    L = len(value_spatial_shapes)
    starts = _level_starts(value_spatial_shapes)

    out = jnp.zeros((B, Lq, nH, C), value.dtype)
    for lvl, (H_l, W_l) in enumerate(value_spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], H_l * W_l,
                                               axis=1)
        value_l = value_l.reshape(B, H_l, W_l, nH, C)
        loc = sampling_locations[:, :, :, lvl]       # (B, Lq, nH, P, 2)
        w = attention_weights[:, :, :, lvl]          # (B, Lq, nH, P)
        sampled = _sample_level(value_l, loc, H_l, W_l)
        out = out + (sampled * w[..., None]).sum(axis=3)
    return out.reshape(B, Lq, nH * C)


def ms_deform_attn_fast(value, value_spatial_shapes, sampling_locations,
                        attention_weights):
    """TPU-optimized formulation: per level, all (query, head, point, corner)
    samples collapse into ONE row gather (take_along_axis on the flattened
    H*W axis) — the layout XLA lowers best on TPU (contiguous (nH*C)-lane
    rows), replacing the generic 4-index gather of the reference semantics.
    Numerically identical to ms_deform_attn_lax.
    """
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    P = sampling_locations.shape[4]
    starts = _level_starts(value_spatial_shapes)

    out = jnp.zeros((B, Lq, nH, C), jnp.float32)
    for lvl, (H_l, W_l) in enumerate(value_spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], H_l * W_l,
                                               axis=1)           # (B, HW, nH, C)
        loc = sampling_locations[:, :, :, lvl]                   # (B, Lq, nH, P, 2)
        w = attention_weights[:, :, :, lvl]                      # (B, Lq, nH, P)

        x = loc[..., 0] * W_l - 0.5
        y = loc[..., 1] * H_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]

        def corner(yy, xx, cw):
            valid = (xx >= 0) & (xx < W_l) & (yy >= 0) & (yy < H_l)
            flat = (jnp.clip(yy, 0, H_l - 1).astype(jnp.int32) * W_l
                    + jnp.clip(xx, 0, W_l - 1).astype(jnp.int32))
            # (B, Lq, nH, P) -> (B, Lq*P, nH, 1): single-axis row gather
            idx = flat.transpose(0, 1, 3, 2).reshape(B, Lq * P, nH, 1)
            g = jnp.take_along_axis(value_l, idx, axis=1)        # (B, LqP, nH, C)
            g = g.reshape(B, Lq, P, nH, C).transpose(0, 1, 3, 2, 4)
            m = jnp.where(valid[..., None], cw, 0.0)  # (B, Lq, nH, P, 1)
            return g.astype(jnp.float32) * m.astype(jnp.float32)

        sampled = corner(y0, x0, (1 - wy) * (1 - wx)) \
            + corner(y0, x0 + 1, (1 - wy) * wx) \
            + corner(y0 + 1, x0, wy * (1 - wx)) \
            + corner(y0 + 1, x0 + 1, wy * wx)                    # (B, Lq, nH, P, C)
        out = out + (sampled * w[..., None].astype(jnp.float32)).sum(axis=3)
    return out.reshape(B, Lq, nH * C).astype(value.dtype)


def ms_deform_attn_block(value, value_spatial_shapes, sampling_locations,
                         attention_weights):
    """Block-slice formulation: ONE vmapped (2, 2, C) dynamic_slice per
    (query, head, level, point) instead of 4 corner gathers — the RAFT
    block-gather lesson (ops/correlation.py corr_lookup_block): XLA's TPU
    gather cost scales with the INDEX COUNT, so fetching each bilinear
    window as one block quarters the cost. Numerically identical to
    ms_deform_attn_lax (clamped slice start + one-hot corner selection
    reproduces the zero-padding OOB semantics)."""
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    P = sampling_locations.shape[4]
    starts = _level_starts(value_spatial_shapes)

    out = jnp.zeros((B, Lq, nH, C), jnp.float32)
    for lvl, (H_l, W_l) in enumerate(value_spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(
            value, starts[lvl], H_l * W_l, axis=1)
        loc = sampling_locations[:, :, :, lvl]        # (B, Lq, nH, P, 2)
        w = attention_weights[:, :, :, lvl]           # (B, Lq, nH, P)
        if H_l < 2 or W_l < 2:
            # degenerate level: 2x2 block slices don't fit; corner gathers
            # are cheap at this size
            sampled = _sample_level(
                value_l.reshape(B, H_l, W_l, nH, C), loc, H_l, W_l)
            out = out + (sampled.astype(jnp.float32)
                         * w[..., None].astype(jnp.float32)).sum(axis=3)
            continue
        # (B, nH, H_l, W_l, C): per-(batch, head) spatial planes
        v = value_l.reshape(B, H_l, W_l, nH, C).transpose(0, 3, 1, 2, 4)

        x = loc[..., 0] * W_l - 0.5
        y = loc[..., 1] * H_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        # clamp the 2x2 window into the image; rel in {-1, 0, 1} marks where
        # the true corner sits relative to the clamped block
        ys = jnp.clip(y0, 0, H_l - 2).astype(jnp.int32)
        xs = jnp.clip(x0, 0, W_l - 2).astype(jnp.int32)
        ry = y0 - ys                                   # float in {-1, 0, 1}
        rx = x0 - xs

        def slice_one(plane, ys1, xs1):
            return jax.lax.dynamic_slice(plane, (ys1, xs1, 0), (2, 2, C))

        # vmap over (B, nH) planes then (Lq, P) windows
        sl = jax.vmap(jax.vmap(                        # B, nH
            jax.vmap(jax.vmap(slice_one, (None, 0, 0)), (None, 0, 0)),
            (0, 0, 0)), (0, 0, 0))
        # rearrange indices to (B, nH, Lq, P)
        blocks = sl(v, ys.transpose(0, 2, 1, 3), xs.transpose(0, 2, 1, 3))
        # blocks: (B, nH, Lq, P, 2, 2, C)

        # corner weights with one-hot selection over the 2-row/2-col block:
        # block row r sits at absolute y = ys + r; it carries the (1-wy)
        # weight when it coincides with corner y0 and the wy weight when it
        # coincides with y0+1, zeroed when that corner is out of bounds
        a0 = jnp.where((ry == 0) & (y0 >= 0), 1 - wy, 0.0) \
            + jnp.where((ry == -1) & (y0 + 1 >= 0) & (y0 + 1 < H_l), wy, 0.0)
        a1 = jnp.where((ry == 0) & (y0 + 1 < H_l), wy, 0.0) \
            + jnp.where((ry == 1) & (y0 >= 0) & (y0 < H_l), 1 - wy, 0.0)
        b0 = jnp.where((rx == 0) & (x0 >= 0), 1 - wx, 0.0) \
            + jnp.where((rx == -1) & (x0 + 1 >= 0) & (x0 + 1 < W_l), wx, 0.0)
        b1 = jnp.where((rx == 0) & (x0 + 1 < W_l), wx, 0.0) \
            + jnp.where((rx == 1) & (x0 >= 0) & (x0 < W_l), 1 - wx, 0.0)
        # (B, Lq, nH, P, 2) -> (B, nH, Lq, P, 2)
        ab = jnp.stack([a0, a1], -1).transpose(0, 2, 1, 3, 4)
        bb = jnp.stack([b0, b1], -1).transpose(0, 2, 1, 3, 4)
        # precision=HIGHEST: default f32 einsum runs bf16 passes on this
        # backend; the contraction is 2x2 so exactness is free.
        sampled = jnp.einsum("bhqpr,bhqprsc,bhqps->bhqpc",
                             ab.astype(jnp.float32),
                             blocks.astype(jnp.float32),
                             bb.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
        contrib = (sampled * w.transpose(0, 2, 1, 3)[..., None]).sum(3)
        out = out + contrib.transpose(0, 2, 1, 3)      # (B, Lq, nH, C)
    return out.reshape(B, Lq, nH * C).astype(value.dtype)


import functools


def _pick_tile_q(shapes) -> int:
    """Query-tile size by level-0 area. Tq=128 won the round-4 hardware
    ablation at 640px (level-0 80x80: 86.1/83.7/83.9 ms at Tq=64/128/256,
    scripts/exp_msda_tq.py) but the kernel's per-program VMEM (coeff plane
    Tq x Len_p plus iota/one-hot planes Tq x Mtot x nJ) scales with
    Tq * level-0 area, so the larger multi-scale buckets (up to ~832x1344,
    level-0 ~104x168) keep Tq=64 — the pre-round-4 default, compile-proven
    across the bucket ladder by the round-4 geometry demo
    (scripts/train_geometry_tpu.py)."""
    lvl0 = shapes[0][0] * shapes[0][1] if shapes else 0
    return 128 if lvl0 <= 80 * 80 else 64


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_pallas(shapes, value, loc, w):
    import jax as _jax
    from .pallas.ms_deform_attn_kernel import ms_deform_attn_pallas
    interpret = _jax.default_backend() == "cpu"
    # The head-fused variant (exp_msda_hf.py: 8 heads per program, shared
    # iotas) landed within the same 83-94 ms band as the Tq ablation: the
    # op is at its construction-floor at these dims, not launch/iota bound.
    return ms_deform_attn_pallas(value, shapes, loc, w, _pick_tile_q(shapes),
                                 interpret)


def _msda_pallas_fwd(shapes, value, loc, w):
    return _msda_pallas(shapes, value, loc, w), (value, loc, w)


def _msda_pallas_bwd(shapes, res, g):
    # Backward = autodiff of the block formulation, verified EXACT on the
    # real TPU vs a CPU oracle (grad rel ~2e-7 at B=2 nH=8 Lq=300, 4
    # levels, round-4 gate). A dedicated Pallas backward kernel was tried
    # across rounds 2-4 and DELETED in round 4: the tunneled backend
    # miscompiled its fused XLA epilogue in round 2, and in the round-4
    # hardware gate the kernel itself failed parity outright (rel 1.2-5.3
    # vs this path's 2e-7) — see DEVELOPMENT.md round-4 negative results.
    # Reference fwd/bwd CUDA pair: ms_deform_attn_cuda.cu:81.
    value, loc, w = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_block(v, shapes, l, a), value, loc, w)
    return vjp(g.astype(value.dtype))


_msda_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)


def ms_deform_attn(value, value_spatial_shapes, sampling_locations,
                   attention_weights, impl: str = "fast"):
    """Dispatch between implementations:

    - 'pallas': gather-free MXU one-hot contraction kernel
      (ops/pallas/ms_deform_attn_kernel.py) — the MODEL DEFAULT at both
      sites (encoder + decoder; the factored-digit construction makes the
      encoder linear in Len_v, and the round-3 transposed layout cut it a
      further 2.3x). Differentiable via a custom VJP whose backward is the
      autodiff of the 'block' formulation (_msda_pallas_bwd above).
    - 'block': ONE (2,2,C) dynamic-slice per sample point (4x fewer gather
      indices than 'fast'; fully differentiable).
    - 'fast': XLA row gathers (take_along_axis).
    - 'lax': the pure-jnp reference semantics (parity oracle).
    """
    if impl == "pallas":
        shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
        return _msda_pallas(shapes, value, sampling_locations,
                            attention_weights)
    if impl == "block":
        return ms_deform_attn_block(value, value_spatial_shapes,
                                    sampling_locations, attention_weights)
    if impl == "fast":
        return ms_deform_attn_fast(value, value_spatial_shapes,
                                   sampling_locations, attention_weights)
    return ms_deform_attn_lax(value, value_spatial_shapes,
                              sampling_locations, attention_weights)
