"""Pallas TPU kernel for multi-scale deformable attention sampling.

Reference CUDA core: /root/reference/alonet/deformable_detr/ops/src/cuda/
ms_deform_im2col_cuda.cuh (per-sample bilinear gathers — a GPU-shaped
design). TPUs have no efficient scattered gather, so this kernel re-casts
the op as MXU work: for each query tile and level, the bilinear corner
selection becomes a one-hot coefficient plane (built on the VPU with
compare+FMA passes, one per (point, corner)) and the sampling collapses to a
single (Tq, HW_l) @ (HW_l, C) matmul on the MXU. No gathers anywhere.

Cost model: MXU flops = Lq * Len_v * C per head (dense over the level), so
this wins where Lq is small relative to the gather cost — the decoder
(Lq=300). The encoder (Lq = Len_v ~ 1e4) would be quadratic; use
``ms_deform_attn_fast`` (XLA row gathers) there. ``ms_deform_attn`` keeps
both behind one interface.

Parity: bit-matches ms_deform_attn_lax (same align_corners=False,
zero-padding semantics); tested in tests/test_pallas_kernels.py (interpret
mode on CPU) and on real TPU by scripts/bench_msda.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_starts(shapes):
    starts = [0]
    for (h, w) in shapes[:-1]:
        starts.append(starts[-1] + h * w)
    return tuple(starts)


def _kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P):
    """Grid: (B, nH, Lq // Tq). Block shapes carry two leading unit dims
    (batch, head) selected by the index map.

    value_ref: (1, 1, Len_v, C) one head's flattened levels
    idx_ref:   (1, 1, L, Tq, 4P) int32 flat corner indices (level-local)
               — Tq on the SUBLANE axis (div-8), 4P on the lane axis (full
               dim): the only layout Pallas accepts for a Tq-tiled block
    cw_ref:    (1, 1, L, Tq, 4P) f32 corner weights (0 where OOB)
    out_ref:   (1, 1, Tq, C)

    The (point, corner) one-hot passes are a STATIC python unroll with
    static lane slices — Mosaic has no dynamic lane indexing (fori_loop +
    dynamic_slice fails to lower); the rolling `coeff = coeff + ...` chain
    still keeps one live coefficient plane.
    """
    Tq = idx_ref.shape[3]
    acc = jnp.zeros((Tq, out_ref.shape[3]), jnp.float32)

    for lvl, (H_l, W_l) in enumerate(shapes):
        HW = H_l * W_l
        v_l = value_ref[0, 0, starts[lvl]:starts[lvl] + HW, :]  # (HW, C)
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tq, HW), 1)
        tile_idx = idx_ref[0, 0, lvl]                 # (Tq, 4P)
        tile_cw = cw_ref[0, 0, lvl]

        coeff = jnp.zeros((Tq, HW), jnp.float32)
        for j in range(4 * P):
            coeff = coeff + jnp.where(iota == tile_idx[:, j:j + 1],
                                      tile_cw[:, j:j + 1], 0.0)
        acc = acc + jax.lax.dot(coeff, v_l.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def _pad_q(loc, w, Lq, Tq):
    pad_q = (-Lq) % Tq
    if pad_q:
        loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0),
                            (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
    return loc, w, Lq + pad_q


# corner visit order shared by forward prep and the backward chain rule:
# (dy, dx) and the bilinear weight / its partials wrt (wx, wy)
_CORNERS = (
    (0, 0, lambda wx, wy: (1 - wy) * (1 - wx),
     lambda wx, wy: -(1 - wy), lambda wx, wy: -(1 - wx)),
    (0, 1, lambda wx, wy: (1 - wy) * wx,
     lambda wx, wy: (1 - wy), lambda wx, wy: -wx),
    (1, 0, lambda wx, wy: wy * (1 - wx),
     lambda wx, wy: -wy, lambda wx, wy: (1 - wx)),
    (1, 1, lambda wx, wy: wy * wx,
     lambda wx, wy: wy, lambda wx, wy: wx),
)


def _corner_indices_weights(shapes, loc, w):
    """Level-local flat corner indices + combined (bilinear x attention)
    weights, laid out for the kernels: idx/cw (B, nH, L, Lq_p, 4P) with the
    last axis corner-major ([c00 x P, c01 x P, c10 x P, c11 x P])."""
    idx_lvls, cw_lvls = [], []
    for lvl, (H_l, W_l) in enumerate(shapes):
        x = loc[:, :, :, lvl, :, 0] * W_l - 0.5       # (B, Lq_p, nH, P)
        y = loc[:, :, :, lvl, :, 1] * H_l - 0.5
        wl = w[:, :, :, lvl]                          # (B, Lq_p, nH, P)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        idx_c, cw_c = [], []
        for dy, dx, bilin, _, _ in _CORNERS:
            yy = y0 + dy
            xx = x0 + dx
            valid = (xx >= 0) & (xx < W_l) & (yy >= 0) & (yy < H_l)
            flat = (jnp.clip(yy, 0, H_l - 1).astype(jnp.int32) * W_l
                    + jnp.clip(xx, 0, W_l - 1).astype(jnp.int32))
            idx_c.append(flat)
            cw_c.append(jnp.where(valid, bilin(wx, wy) * wl, 0.0))
        # (B, Lq_p, nH, 4P) -> (B, nH, Lq_p, 4P)
        idx_lvls.append(jnp.concatenate(idx_c, -1).transpose(0, 2, 1, 3))
        cw_lvls.append(jnp.concatenate(cw_c, -1).transpose(0, 2, 1, 3))
    idx = jnp.stack(idx_lvls, axis=2)                 # (B, nH, L, Lq_p, 4P)
    cw = jnp.stack(cw_lvls, axis=2).astype(jnp.float32)
    return idx, cw


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def ms_deform_attn_pallas(value, value_spatial_shapes, sampling_locations,
                          attention_weights, tile_q: int = 64,
                          interpret: bool = False):
    """Shapes as in ops/ms_deform_attn.py:
    value (B, Len_v, nH, C); sampling_locations (B, Lq, nH, L, P, 2) in
    [0,1]; attention_weights (B, Lq, nH, L, P). Returns (B, Lq, nH * C).
    """
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    L = len(value_spatial_shapes)
    P = sampling_locations.shape[4]
    shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
    starts = _level_starts(shapes)

    Tq = min(tile_q, Lq)
    loc, w, Lq_p = _pad_q(sampling_locations, attention_weights, Lq, Tq)
    idx, cw = _corner_indices_weights(shapes, loc, w)

    # head-major value so each grid step sees one head's contiguous plane
    value_h = value.transpose(0, 2, 1, 3)             # (B, nH, Len_v, C)

    kernel = functools.partial(_kernel, shapes=shapes, starts=starts, P=P)
    out = pl.pallas_call(
        kernel,
        grid=(B, nH, Lq_p // Tq),
        in_specs=[
            pl.BlockSpec((1, 1, Len_v, C), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Tq, 4 * P),
                         lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Tq, 4 * P),
                         lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Tq, C), lambda b, h, t: (b, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
        interpret=interpret,
    )(value_h, idx, cw)

    out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
    return out[:, :Lq]


def _bwd_kernel(value_ref, idx_ref, cw_ref, g_ref, dval_ref, dcw_ref, *,
                shapes, starts, P):
    """Backward pass, same one-hot structure as the forward.

    Per (b, h) and query tile t (innermost SEQUENTIAL grid dim):
      dvalue[hw, c] += coeff(t)^T @ g(t)      accumulated across tiles
      dcw[t, j]      = sum_hw 1[idx_j == hw] * (g(t) @ value^T)[q, hw]
    """
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        dval_ref[0, 0, :, :] = jnp.zeros_like(dval_ref[0, 0, :, :])

    Tq = idx_ref.shape[3]
    g = g_ref[0, 0, :, :].astype(jnp.float32)          # (Tq, C)

    for lvl, (H_l, W_l) in enumerate(shapes):
        HW = H_l * W_l
        v_l = value_ref[0, 0, starts[lvl]:starts[lvl] + HW, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tq, HW), 1)
        tile_idx = idx_ref[0, 0, lvl]                  # (Tq, 4P)
        tile_cw = cw_ref[0, 0, lvl]

        coeff = jnp.zeros((Tq, HW), jnp.float32)
        for j in range(4 * P):
            coeff = coeff + jnp.where(iota == tile_idx[:, j:j + 1],
                                      tile_cw[:, j:j + 1], 0.0)
        dval_ref[0, 0, starts[lvl]:starts[lvl] + HW, :] = (
            dval_ref[0, 0, starts[lvl]:starts[lvl] + HW, :]
            + jax.lax.dot(coeff.T, g,
                          preferred_element_type=jnp.float32
                          ).astype(dval_ref.dtype))

        # S[q, hw] = sum_c g[q, c] * v[hw, c]
        S = jax.lax.dot(g, v_l.astype(jnp.float32).T,
                        preferred_element_type=jnp.float32)  # (Tq, HW)
        for j in range(4 * P):
            picked = jnp.where(iota == tile_idx[:, j:j + 1], S, 0.0)
            dcw_ref[0, 0, lvl, :, j:j + 1] = jnp.sum(picked, axis=1,
                                                     keepdims=True)


@functools.partial(jax.jit, static_argnums=(1, 5, 6))
def ms_deform_attn_pallas_bwd(value, value_spatial_shapes,
                              sampling_locations, attention_weights, g,
                              tile_q: int = 64, interpret: bool = False):
    """VJP of ms_deform_attn_pallas: g (B, Lq, nH * C) ->
    (dvalue, dsampling_locations, dattention_weights).

    The kernel produces dvalue and the gradient wrt the COMBINED corner
    weights (bilinear x attention); the chain rule back to locations and
    attention weights is elementwise XLA (exactly the autodiff of the
    forward prep: floor() contributes zero, d wx / d loc_x = W_l)."""
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    L = len(value_spatial_shapes)
    P = sampling_locations.shape[4]
    shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
    starts = _level_starts(shapes)

    Tq = min(tile_q, Lq)
    loc, w, Lq_p = _pad_q(sampling_locations, attention_weights, Lq, Tq)
    idx, cw = _corner_indices_weights(shapes, loc, w)

    g = g.reshape(B, Lq, nH, C)
    if Lq_p != Lq:
        g = jnp.pad(g, ((0, 0), (0, Lq_p - Lq), (0, 0), (0, 0)))
    g_h = g.transpose(0, 2, 1, 3)                      # (B, nH, Lq_p, C)
    value_h = value.transpose(0, 2, 1, 3)              # (B, nH, Len_v, C)

    kernel = functools.partial(_bwd_kernel, shapes=shapes, starts=starts,
                               P=P)
    dval_h, dcw = pl.pallas_call(
        kernel,
        grid=(B, nH, Lq_p // Tq),
        in_specs=[
            pl.BlockSpec((1, 1, Len_v, C), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Tq, 4 * P),
                         lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Tq, 4 * P),
                         lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tq, C), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Len_v, C), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, Tq, 4 * P),
                         lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nH, Len_v, C), jnp.float32),
            jax.ShapeDtypeStruct((B, nH, L, Lq_p, 4 * P), jnp.float32),
        ],
        interpret=interpret,
    )(value_h, idx, cw, g_h)

    dvalue = dval_h.transpose(0, 2, 1, 3).astype(value.dtype)

    # chain rule: dcw (B, nH, L, Lq_p, 4P, corner-major) -> dloc, dw
    dcw = dcw.transpose(0, 3, 1, 2, 4)                 # (B, Lq_p, nH, L, 4P)
    dloc_x = jnp.zeros((B, Lq_p, nH, L, P), jnp.float32)
    dloc_y = jnp.zeros_like(dloc_x)
    dw = jnp.zeros_like(dloc_x)
    for lvl, (H_l, W_l) in enumerate(shapes):
        x = loc[:, :, :, lvl, :, 0] * W_l - 0.5
        y = loc[:, :, :, lvl, :, 1] * H_l - 0.5
        wl = w[:, :, :, lvl]
        wx = x - jnp.floor(x)
        wy = y - jnp.floor(y)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx_l = jnp.zeros_like(wx)
        dy_l = jnp.zeros_like(wx)
        dw_l = jnp.zeros_like(wx)
        for c, (dy_c, dx_c, bilin, dbdx, dbdy) in enumerate(_CORNERS):
            valid = ((x0 + dx_c >= 0) & (x0 + dx_c < W_l)
                     & (y0 + dy_c >= 0) & (y0 + dy_c < H_l))
            dcw_c = jnp.where(valid, dcw[:, :, :, lvl, c * P:(c + 1) * P],
                              0.0)
            dw_l = dw_l + dcw_c * bilin(wx, wy)
            dx_l = dx_l + dcw_c * wl * dbdx(wx, wy)
            dy_l = dy_l + dcw_c * wl * dbdy(wx, wy)
        dloc_x = dloc_x.at[:, :, :, lvl].set(dx_l * W_l)
        dloc_y = dloc_y.at[:, :, :, lvl].set(dy_l * H_l)
        dw = dw.at[:, :, :, lvl].set(dw_l)

    dloc = jnp.stack([dloc_x, dloc_y], axis=-1)[:, :Lq]
    dw = dw[:, :Lq]
    return (dvalue, dloc.astype(sampling_locations.dtype),
            dw.astype(attention_weights.dtype))
