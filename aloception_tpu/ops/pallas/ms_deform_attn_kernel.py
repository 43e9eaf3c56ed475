"""Pallas TPU kernel for multi-scale deformable attention sampling.

Reference CUDA core: /root/reference/alonet/deformable_detr/ops/src/cuda/
ms_deform_im2col_cuda.cuh (per-sample bilinear gathers — a GPU-shaped
design). TPUs have no efficient scattered gather, so this kernel re-casts
the op as MXU work: for each query tile and level, the bilinear corner
selection becomes a one-hot coefficient plane (built on the VPU with
compare+FMA passes, one per (point, corner)) and the sampling collapses to a
single (Tq, HW_l) @ (HW_l, C) matmul on the MXU. No gathers anywhere.

Cost model: the factored-digit one-hot (hw = m*128 + l) makes the
coefficient construction O(Lq * 4P * (Mtot + 128)) on the VPU and turns
sampling into one (Tq, Len_p) @ (Len_p, C) MXU matmul per tile — linear in
Len_v, fast enough to be the default at BOTH sites (encoder Lq ~ 1e4 and
decoder Lq = 300). Round-3: the transposed construction (iota on sublanes,
indices lane-resident) cut the encoder op 87 -> 37 ms and the decoder
5.6 -> 1.5 ms (bf16, B=8, 640px levels; scripts/exp_msda2.py ablation).

Parity: bit-matches ms_deform_attn_lax (same align_corners=False,
zero-padding semantics); tested in tests/test_pallas_kernels.py (interpret
mode on CPU) and on real TPU by scripts/tpu_parity_msda.py — run that
script after ANY change here (interpret mode does not validate the real
lowering on this backend).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANE = 128          # TPU lane width; the low digit of the factored one-hot
_DENSE_MAX = 256     # levels this small keep the dense compare-FMA path


def _pad_hw(HW):
    return -(-HW // _LANE) * _LANE


def _level_starts(shapes):
    """Level offsets in the LANE-PADDED flat value layout (each level padded
    to a multiple of 128 rows so its plane reshapes to (M, 128))."""
    starts = [0]
    for (h, w) in shapes[:-1]:
        starts.append(starts[-1] + _pad_hw(h * w))
    return tuple(starts)


def _pad_value_levels(value_h, shapes):
    """(B, nH, Len_v, C) -> (B, nH, Len_p, C) with per-level zero padding to
    a multiple of 128 rows."""
    segs, s = [], 0
    for (h, w) in shapes:
        HW = h * w
        seg = value_h[:, :, s:s + HW]
        pad = _pad_hw(HW) - HW
        if pad:
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, pad), (0, 0)))
        segs.append(seg)
        s += HW
    return jnp.concatenate(segs, axis=2)


def _coeff_plane(tile_idx, tile_cw, HW, P, Tq, dtype):
    """Combined-corner-weight plane (Tq, HWp) for one level.

    Factored construction (the key to encoder speed): the flat index hw
    splits into digits hw = m * 128 + l, so the weighted one-hot over HWp
    factorizes per corner j into a high one-hot Ha[q,j,m] (carrying the
    weight) and a low one-hot Lb[q,j,l]; summing over the 4P corners is then
    ONE batched (M,4P)@(4P,128) matmul per query — MXU work. The dense
    compare-FMA alternative costs Tq*HW*4P VPU ops and dominated the
    encoder (~190 ms/layer at 640px); levels smaller than _DENSE_MAX keep
    it (M would be 1-2 and the comparisons are already trivial there).
    """
    HWp = _pad_hw(HW)
    if HW <= _DENSE_MAX:
        iota = jax.lax.broadcasted_iota(jnp.int32, (Tq, HWp), 1)
        coeff = jnp.zeros((Tq, HWp), jnp.float32)
        for j in range(4 * P):
            coeff = coeff + jnp.where(iota == tile_idx[:, j:j + 1],
                                      tile_cw[:, j:j + 1], 0.0)
        return coeff.astype(dtype)
    M = HWp // _LANE
    hi = tile_idx // _LANE                               # (Tq, 4P)
    lo = tile_idx - hi * _LANE
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, 4 * P, M), 2)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, 4 * P, _LANE), 2)
    Ha = jnp.where(iota_m == hi[:, :, None], tile_cw[:, :, None], 0.0)
    Lb = jnp.where(iota_l == lo[:, :, None], 1.0, 0.0)
    # HIGHEST on the f32 path: a single bf16 MXU pass on f32 weights costs
    # ~1% error (the one-hot-contraction precision trap, DEVELOPMENT.md).
    # Mosaic rejects HIGHEST for bf16 operands ("Bad lhs type"), so the
    # bf16 model path keeps default precision — consistent with its dtype.
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    coeff = jax.lax.dot_general(
        Ha.astype(dtype), Lb.astype(dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec)                                  # (Tq, M, 128)
    return coeff.reshape(Tq, HWp).astype(dtype)


def _kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P):
    """Grid: (B, nH, Lq // Tq). Block shapes carry two leading unit dims
    (batch, head) selected by the index map.

    value_ref: (1, 1, Len_p, C) one head's lane-padded flattened levels
    idx_ref:   (1, 1, L, Tq, 4P) int32 flat corner indices (level-local)
               — Tq on the SUBLANE axis (div-8), 4P on the lane axis (full
               dim): the only layout Pallas accepts for a Tq-tiled block
    cw_ref:    (1, 1, L, Tq, 4P) f32 corner weights (0 where OOB)
    out_ref:   (1, 1, Tq, C)

    All levels larger than _DENSE_MAX share ONE factored one-hot: because
    each level is lane-padded, the GLOBAL padded row index start+hw splits
    into digits (m, l) with a single iota over the whole padded plane, so
    every large level's corners go into one batched (Mtot, nJ)@(nJ, 128)
    matmul per query tile (fewer, larger MXU launches than per-level).
    Small levels keep the dense compare path into their slice, everything
    concatenates into one (Tq, Len_p) coefficient plane, and sampling is a
    single (Tq, Len_p) @ (Len_p, C) matmul. Per-corner passes are STATIC
    python unrolls — Mosaic has no dynamic lane indexing.
    """
    Tq = idx_ref.shape[3]
    mm_dtype = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
        else jnp.float32
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None

    big = [lvl for lvl, (h, w) in enumerate(shapes) if h * w > _DENSE_MAX]
    small = [lvl for lvl, (h, w) in enumerate(shapes) if h * w <= _DENSE_MAX]
    # big levels form a contiguous prefix of the padded value layout
    # (levels are ordered large->small in deformable FPN pyramids)
    assert big == list(range(len(big))), shapes

    parts = []
    if big:
        end = starts[len(big) - 1] + _pad_hw(
            shapes[len(big) - 1][0] * shapes[len(big) - 1][1])
        Mtot = end // _LANE
        his, los, cws = [], [], []
        for lvl in big:
            gidx = idx_ref[0, 0, lvl] + starts[lvl]    # GLOBAL padded row
            hi = gidx // _LANE
            his.append(hi)
            los.append(gidx - hi * _LANE)
            cws.append(cw_ref[0, 0, lvl])
        hi = jnp.concatenate(his, axis=1)              # (Tq, nJ)
        lo = jnp.concatenate(los, axis=1)
        cw = jnp.concatenate(cws, axis=1)
        nJ = hi.shape[1]
        # TRANSPOSED construction (round-3, scripts/exp_msda2.py): iota runs
        # on the SUBLANE axis and hi/lo/cw stay lane-resident via [:, None, :]
        # — Mosaic lowers this ~1.7x faster than the lane-axis iota with
        # [:, :, None] broadcasts (which relayouts j from lanes to sublanes).
        # The batched dot contracts the shared lane dim nJ instead.
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)
        HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
        LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)
        coeff_big = jax.lax.dot_general(
            HaT.astype(mm_dtype), LbT.astype(mm_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=prec)                            # (Tq, Mtot, 128)
        parts.append(coeff_big.reshape(Tq, end).astype(mm_dtype))
    for lvl in small:
        H_l, W_l = shapes[lvl]
        parts.append(_coeff_plane(idx_ref[0, 0, lvl], cw_ref[0, 0, lvl],
                                  H_l * W_l, P, Tq, mm_dtype))
    coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm_dtype),
                      preferred_element_type=jnp.float32, precision=prec)
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
    last axis corner-major ([c00 x P, c01 x P, c10 x P, c11 x P]).

    NOTE the attention weight w is deliberately NOT sliced per level inside
    the level loop: on the tunneled TPU backend, XLA's fusion of
    pad+slice+transpose miscompiled ``w[:, :, :, lvl]`` to always read
    level 0's slice (verified against a numpy oracle at B=2, nH=8, Lq=300,
    L=2 — every level-1 weight matched level 0's instead). Building the
    bilinear-only planes per level and multiplying the whole stacked tensor
    by one transposed copy of w sidesteps the buggy fusion pattern."""
    idx_lvls, bw_lvls = [], []
    for lvl, (H_l, W_l) in enumerate(shapes):
        x = loc[:, :, :, lvl, :, 0] * W_l - 0.5       # (B, Lq_p, nH, P)
        y = loc[:, :, :, lvl, :, 1] * H_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        idx_c, bw_c = [], []
        for dy, dx, bilin, _, _ in _CORNERS:
            yy = y0 + dy
            xx = x0 + dx
            valid = (xx >= 0) & (xx < W_l) & (yy >= 0) & (yy < H_l)
            flat = (jnp.clip(yy, 0, H_l - 1).astype(jnp.int32) * W_l
                    + jnp.clip(xx, 0, W_l - 1).astype(jnp.int32))
            idx_c.append(flat)
            bw_c.append(jnp.where(valid, bilin(wx, wy), 0.0))
        # (B, Lq_p, nH, 4P) -> (B, nH, Lq_p, 4P)
        idx_lvls.append(jnp.concatenate(idx_c, -1).transpose(0, 2, 1, 3))
        bw_lvls.append(jnp.concatenate(bw_c, -1).transpose(0, 2, 1, 3))
    idx = jnp.stack(idx_lvls, axis=2)                 # (B, nH, L, Lq_p, 4P)
    bw = jnp.stack(bw_lvls, axis=2).astype(jnp.float32)
    # w (B, Lq_p, nH, L, P) -> (B, nH, L, Lq_p, P), tiled corner-major to 4P
    wt = w.transpose(0, 2, 3, 1, 4).astype(jnp.float32)
    cw = bw * jnp.concatenate([wt, wt, wt, wt], axis=-1)
    return idx, cw


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 6))
def ms_deform_attn_pallas(value, value_spatial_shapes, sampling_locations,
                          attention_weights, tile_q: int = 64,
                          interpret: bool = False,
                          vmem_limit_bytes: int | None = None):
    """Shapes as in ops/ms_deform_attn.py:
    value (B, Len_v, nH, C); sampling_locations (B, Lq, nH, L, P, 2) in
    [0,1]; attention_weights (B, Lq, nH, L, P). Returns (B, Lq, nH * C).

    Layout: per-(batch, head) grid with the transposed construction (the
    round-3 measured winner). Variants tried and DELETED on hardware
    evidence (DEVELOPMENT.md round-4 negative results):
    - hl/hlb heads-in-lanes layouts: hl crashed the backend compiler at
      production dims (63.6M scoped VMEM, then tpu_compile_helper exit 1
      at a raised limit); hlb's bf16 iota does not lower on this Mosaic
      version.
    - prep="fused" in-kernel corner math: won the synthetic op-level bench
      (71.4 vs 101.1 ms B=8 encoder) but LOST end-to-end in the real model
      (deformable bs16 640px bf16: 678 vs 583 ms) — in-graph, XLA already
      fuses most of the host-side prep, and the synthetic producer chain
      had overstated its cost.
    """
    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    L = len(value_spatial_shapes)
    P = sampling_locations.shape[4]
    shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
    starts = _level_starts(shapes)

    Tq = min(tile_q, Lq)
    loc, w, Lq_p = _pad_q(sampling_locations, attention_weights, Lq, Tq)

    # head-major value so each grid step sees one head's contiguous plane,
    # lane-padded per level for the factored one-hot
    value_h = _pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
    Len_p = value_h.shape[2]

    idx, cw = _corner_indices_weights(shapes, loc, w)

    # Fusion barrier (measured, not defensive): when loc comes from in-graph
    # computation (the MSDeformAttn module's offsets matmul + broadcast),
    # XLA fuses that producer chain into the prep's per-level slices and the
    # op goes 70 -> 126 ms (B=16 640px encoder). Materializing the prep
    # outputs here recovers most of it (126 -> 88 ms); with loc as a device
    # constant the op is 70 ms either way. /tmp-gap experiments, round 3.
    if not interpret:
        value_h, idx, cw = jax.lax.optimization_barrier((value_h, idx, cw))

    kernel = functools.partial(_kernel, shapes=shapes, starts=starts, P=P)
    out = pl.pallas_call(
        kernel,
        grid=(B, nH, Lq_p // Tq),
        in_specs=[
            pl.BlockSpec((1, 1, Len_p, C), lambda b, h, t: (b, h, 0, 0),
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
        compiler_params=(None if vmem_limit_bytes is None else
                         pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit_bytes)),
    )(value_h, idx, cw)

    out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
    return out[:, :Lq]
