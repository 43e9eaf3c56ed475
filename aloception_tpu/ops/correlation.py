"""RAFT all-pairs correlation volume + pyramid lookup.

Reference: alonet/raft/corr.py:12-60 (CorrBlock). The volume is one batched
matmul — exactly what the MXU wants: (B, HW, C) @ (B, C, HW) -> (B, HW, HW).
The per-iteration radius lookup is a gather + bilinear interpolation over a
4-level average-pooled pyramid; expressed with vmap over query pixels so XLA
vectorizes it on the VPU (AlternateCorrBlock, corr.py:63, is the blockwise
recompute variant — the pyramid here fits VMEM/HBM comfortably at RAFT's 1/8
resolution).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from .warp import bilinear_sample


def corr_volume(fmap1, fmap2):
    """(B, H, W, C) x2 -> (B, H*W, H, W) correlation / sqrt(C)
    (corr.py:18-27)."""
    B, H, W, C = fmap1.shape
    f1 = fmap1.reshape(B, H * W, C)
    f2 = fmap2.reshape(B, H * W, C)
    # precision=HIGHEST: default f32 einsum runs bf16 passes on this backend;
    # the torch reference computes the volume in exact f32 and the EPE-parity
    # tests depend on it. Cost is sub-ms at RAFT scales (bf16 feature inputs
    # should be cast by the caller when speed matters more than parity).
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return (corr / jnp.sqrt(jnp.float32(C))).reshape(B, H * W, H, W)


def corr_pyramid(corr, num_levels: int = 4) -> List[jnp.ndarray]:
    """Average-pool the last two dims into a pyramid (corr.py:25-27).

    2x2/stride-2 VALID pooling (floor on odd dims, matching F.avg_pool2d)."""
    pyramid = [corr]
    for _ in range(num_levels - 1):
        c = pyramid[-1]
        c = jax.lax.reduce_window(
            c, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
        pyramid.append(c)
    return pyramid


def corr_lookup(pyramid: List[jnp.ndarray], coords, radius: int = 4):
    """Radius-window bilinear lookup at each level (corr.py:29-50).

    coords: (B, H, W, 2) current (x, y) positions at level 0.
    Returns (B, H, W, num_levels * (2r+1)^2).

    Window channel order follows the reference exactly: channel k = i*d + j
    samples (x + off[i], y + off[j]) — the X offset varies on the OUTER axis
    (corr.py:37-41 builds delta with meshgrid(dy, dx) and then feeds
    component 0 to the sampler's x grid; an upstream-RAFT quirk that
    converted convc1 weights depend on).

    TPU formulation: per level all (window, corner) samples collapse into one
    row gather over the flattened Hl*Wl axis (take_along_axis per query row)
    — no per-pixel vmap gathers.
    """
    B, N, H, W = pyramid[0].shape
    r = radius
    d = 2 * r + 1
    dx, dy = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                          jnp.arange(-r, r + 1, dtype=jnp.float32),
                          indexing="ij")  # x offset on the OUTER axis
    dx = dx.reshape(-1)   # (d*d,)
    dy = dy.reshape(-1)

    outs = []
    for lvl, c in enumerate(pyramid):
        Hl, Wl = c.shape[2], c.shape[3]
        cl = c.reshape(B, N, Hl * Wl)
        centroid = coords.reshape(B, N, 2) / (2 ** lvl)
        xs = centroid[..., 0:1] + dx[None, None]     # (B, N, d*d)
        ys = centroid[..., 1:2] + dy[None, None]
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        wx = xs - x0
        wy = ys - y0

        def corner(yy, xx, cw):
            valid = (xx >= 0) & (xx < Wl) & (yy >= 0) & (yy < Hl)
            flat = (jnp.clip(yy, 0, Hl - 1).astype(jnp.int32) * Wl
                    + jnp.clip(xx, 0, Wl - 1).astype(jnp.int32))
            g = jnp.take_along_axis(cl, flat, axis=2)
            return g * jnp.where(valid, cw, 0.0)

        sampled = corner(y0, x0, (1 - wy) * (1 - wx)) \
            + corner(y0, x0 + 1, (1 - wy) * wx) \
            + corner(y0 + 1, x0, wy * (1 - wx)) \
            + corner(y0 + 1, x0 + 1, wy * wx)        # (B, N, d*d)
        outs.append(sampled.reshape(B, H, W, d * d))
    return jnp.concatenate(outs, axis=-1)


def corr_lookup_rows(pyramid: List[jnp.ndarray], coords, radius: int = 4):
    """Two-stage-gather variant of corr_lookup: per level, gather the
    (2r+2) CONTIGUOUS volume rows covering the window (one row gather of
    width W_l), then pick the window columns from those rows.
    Numerically identical to corr_lookup (parity 1e-6).

    Measured on TPU v5e (368x496 scale, r=4, 4 levels): 129 ms vs 101 ms for
    the 4-corner variant — the extra row bytes outweigh the contiguity win,
    so corr_lookup stays the default. Both are gather-bound: XLA's TPU
    gather reaches only ~0.3 GB/s effective here, making the lookup RAFT's
    dominant cost (~1.2 s of 1.9 s/pair at 12 iters) — the standing
    optimization target.
    """
    B, N, H, W = pyramid[0].shape
    r = radius
    d = 2 * r + 1
    dy = jnp.arange(-r, r + 2, dtype=jnp.float32)     # d+1 rows (for y1 corner)
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)

    outs = []
    for lvl, c in enumerate(pyramid):
        Hl, Wl = c.shape[2], c.shape[3]
        cl = c.reshape(B, N, Hl * Wl)
        centroid = coords.reshape(B, N, 2) / (2 ** lvl)
        x0f = jnp.floor(centroid[..., 0:1] + dx[None, None])   # (B, N, d)
        y0f = jnp.floor(centroid[..., 1:2] - r)                # (B, N, 1) base row
        wy = (centroid[..., 1:2] - r) - y0f                    # frac, same all rows

        # stage 1: gather d+1 full rows (contiguous Wl columns each)
        rows_y = y0f + jnp.arange(0, d + 1, dtype=jnp.float32)[None, None]
        rows_valid = (rows_y >= 0) & (rows_y < Hl)             # (B, N, d+1)
        rows_i = jnp.clip(rows_y, 0, Hl - 1).astype(jnp.int32)
        flat_start = rows_i * Wl                               # (B, N, d+1)
        col_ids = jnp.arange(Wl, dtype=jnp.int32)
        row_idx = (flat_start[..., None] + col_ids).reshape(B, N, -1)
        rows = jnp.take_along_axis(cl, row_idx, axis=2)
        rows = rows.reshape(B, N, d + 1, Wl)
        rows = rows * rows_valid[..., None]

        # stage 2: bilinear in y between consecutive rows, then x columns
        top = rows[:, :, :d]
        bot = rows[:, :, 1:]
        wyc = wy[..., None]
        rows_y_interp = top * (1 - wyc) + bot * wyc            # (B, N, d, Wl)

        wx = (centroid[..., 0:1] + dx[None, None]) - x0f       # (B, N, d)
        x0 = x0f
        xv0 = (x0 >= 0) & (x0 < Wl)
        xv1 = (x0 + 1 >= 0) & (x0 + 1 < Wl)
        x0i = jnp.clip(x0, 0, Wl - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, Wl - 1).astype(jnp.int32)
        # pick columns: (B, N, d, d) from (B, N, d, Wl)
        g0 = jnp.take_along_axis(
            rows_y_interp, jnp.broadcast_to(x0i[:, :, None, :], (B, N, d, d)),
            axis=3) * xv0[:, :, None, :]
        g1 = jnp.take_along_axis(
            rows_y_interp, jnp.broadcast_to(x1i[:, :, None, :], (B, N, d, d)),
            axis=3) * xv1[:, :, None, :]
        sampled = g0 * (1 - wx)[:, :, None, :] + g1 * wx[:, :, None, :]
        # (B, N, d_y, d_x) -> x-outer channel order (reference quirk)
        sampled = jnp.swapaxes(sampled, -1, -2)
        outs.append(sampled.reshape(B, H, W, d * d))
    return jnp.concatenate(outs, axis=-1)


def corr_lookup_onehot(pyramid: List[jnp.ndarray], coords, radius: int = 4):
    """Gather-FREE corr lookup: bilinear window sampling as two batched
    matmuls against one-hot interpolation matrices over the FULL level row.

    out[q, j, i] = sum_{y,x} Wy[q,i,y] * vol[q,y,x] * Wx[q,j,x]
    where Wy/Wx each have two nonzeros per row (the bilinear corners, with
    border-validity zeroing). No gather/dynamic_slice appears anywhere —
    everything is iota-compare (VPU) + dot_general (MXU), the ops the TPU
    is actually fast at. Numerically identical to corr_lookup.
    """
    B, N, H, W = pyramid[0].shape
    r = radius
    d = 2 * r + 1
    i_ids = jnp.arange(d, dtype=jnp.float32)

    outs = []
    for lvl, c in enumerate(pyramid):
        Hl, Wl = c.shape[2], c.shape[3]
        centroid = coords.reshape(B, N, 2) / (2 ** lvl)
        cx, cy = centroid[..., 0], centroid[..., 1]

        def onehot_interp(cv, L):
            """(B, N) centers -> (B, N, d, L) bilinear one-hot matrix."""
            v0 = jnp.floor(cv[..., None] - r) + i_ids          # (B, N, d)
            w = (cv[..., None] - r + i_ids) - v0               # frac
            ids = jnp.arange(L, dtype=jnp.float32)
            eq0 = (v0[..., None] == ids).astype(c.dtype)       # (B, N, d, L)
            eq1 = (v0[..., None] + 1 == ids).astype(c.dtype)
            valid0 = (v0 >= 0) & (v0 < L)
            valid1 = (v0 + 1 >= 0) & (v0 + 1 < L)
            return eq0 * jnp.where(valid0, 1 - w, 0.0)[..., None] \
                + eq1 * jnp.where(valid1, w, 0.0)[..., None]

        Wy = onehot_interp(cy, Hl)                             # (B, N, d, Hl)
        Wx = onehot_interp(cx, Wl)                             # (B, N, d, Wl)
        # (B,N,d,Hl) @ (B,N,Hl,Wl) @ (B,N,Wl,d) -> x-outer (j) channel order.
        # precision=HIGHEST: the default f32 matmul runs bf16 passes on both
        # TPU and this CPU backend (measured 0.4% rel error); these one-hot
        # contractions are tiny so exactness is free.
        t = jnp.einsum("bniy,bnyx->bnix", Wy, c,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        sampled = jnp.einsum("bnix,bnjx->bnji", t, Wx,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        outs.append(sampled.reshape(B, H, W, d * d))
    return jnp.concatenate(outs, axis=-1)


def corr_lookup_block(pyramid: List[jnp.ndarray], coords, radius: int = 4):
    """Block-gather corr lookup: ONE 2-D dynamic slice per (query, level).

    TPU insight (measured): XLA gather cost scales with the number of gather
    indices, not bytes — the element-wise lookup issues (2r+1)^2 * 4 corner
    indices per query per level. Here the whole bilinear window is one
    contiguous (d+1, d+2) block of the volume row, fetched with a single
    vmapped dynamic_slice (one index), and the bilinear corner selection
    becomes two tiny one-hot contractions (pure VPU/MXU ops, no gathers).
    Numerically identical to corr_lookup.
    """
    B, N, H, W = pyramid[0].shape
    r = radius
    d = 2 * r + 1
    rows = d + 1            # y corners span floor(cy-r) .. floor(cy+r)+1
    span = d + 1            # x corners span floor(cx-r) .. floor(cx+r)+1

    outs = []
    for lvl, c in enumerate(pyramid):
        Hl, Wl = c.shape[2], c.shape[3]
        if Hl < rows or Wl < span:
            # level smaller than the window: element-gather fallback
            # (cheap at these sizes)
            cl = c.reshape(B, N, Hl * Wl)
            centroid = coords.reshape(B, N, 2) / (2 ** lvl)
            # x offset on the OUTER window axis (reference quirk, see
            # corr_lookup docstring)
            dxv, dyv = jnp.meshgrid(jnp.arange(-r, r + 1, dtype=jnp.float32),
                                    jnp.arange(-r, r + 1, dtype=jnp.float32),
                                    indexing="ij")
            xs = centroid[..., 0:1] + dxv.reshape(-1)[None, None]
            ys = centroid[..., 1:2] + dyv.reshape(-1)[None, None]
            x0 = jnp.floor(xs)
            y0 = jnp.floor(ys)
            wx = xs - x0
            wy = ys - y0

            def corner(yy, xx, cw):
                valid = (xx >= 0) & (xx < Wl) & (yy >= 0) & (yy < Hl)
                flat = (jnp.clip(yy, 0, Hl - 1).astype(jnp.int32) * Wl
                        + jnp.clip(xx, 0, Wl - 1).astype(jnp.int32))
                return jnp.take_along_axis(cl, flat, axis=2) \
                    * jnp.where(valid, cw, 0.0)

            sampled = corner(y0, x0, (1 - wy) * (1 - wx)) \
                + corner(y0, x0 + 1, (1 - wy) * wx) \
                + corner(y0 + 1, x0, wy * (1 - wx)) \
                + corner(y0 + 1, x0 + 1, wy * wx)
            outs.append(sampled.reshape(B, H, W, d * d))
            continue
        centroid = coords.reshape(B, N, 2) / (2 ** lvl)
        cx, cy = centroid[..., 0], centroid[..., 1]
        x0min = jnp.floor(cx - r)            # float
        y0min = jnp.floor(cy - r)
        x_start = jnp.clip(x0min, 0, Wl - span).astype(jnp.int32)
        y_start = jnp.clip(y0min, 0, Hl - rows).astype(jnp.int32)

        vol = c                               # (B, N, Hl, Wl)

        def slice_one(vol_n, ys, xs):
            return jax.lax.dynamic_slice(vol_n, (ys, xs), (rows, span))

        window = jax.vmap(jax.vmap(slice_one))(vol, y_start, x_start)
        # window: (B, N, rows, span)

        # one-hot y interpolation matrix Wy: (B, N, d, rows)
        wy = (cy - r) - y0min                 # frac, shared by all samples
        i_ids = jnp.arange(d, dtype=jnp.float32)
        r_ids = jnp.arange(rows, dtype=jnp.float32)
        # true row of sample i: y0min + i ; rel row = y0min + i - y_start
        rel_y = (y0min[..., None] + i_ids[None, None]
                 - y_start[..., None].astype(jnp.float32))   # (B, N, d)
        y_true = y0min[..., None] + i_ids[None, None]
        v_y0 = (y_true >= 0) & (y_true < Hl)
        v_y1 = (y_true + 1 >= 0) & (y_true + 1 < Hl)
        eq0 = (rel_y[..., None] == r_ids).astype(window.dtype)
        eq1 = (rel_y[..., None] + 1 == r_ids).astype(window.dtype)
        Wy = eq0 * jnp.where(v_y0, 1 - wy[..., None], 0.0)[..., None] \
            + eq1 * jnp.where(v_y1, wy[..., None], 0.0)[..., None]

        # one-hot x matrix Wx: (B, N, d, span)
        x_true0 = x0min[..., None] + i_ids[None, None]        # floor(cx+j-r)
        wx = (cx[..., None] + i_ids[None, None] - r) - x_true0
        rel_x = x_true0 - x_start[..., None].astype(jnp.float32)
        s_ids = jnp.arange(span, dtype=jnp.float32)
        v_x0 = (x_true0 >= 0) & (x_true0 < Wl)
        v_x1 = (x_true0 + 1 >= 0) & (x_true0 + 1 < Wl)
        ex0 = (rel_x[..., None] == s_ids).astype(window.dtype)
        ex1 = (rel_x[..., None] + 1 == s_ids).astype(window.dtype)
        Wx = ex0 * jnp.where(v_x0, 1 - wx, 0.0)[..., None] \
            + ex1 * jnp.where(v_x1, wx, 0.0)[..., None]

        # output channel order (x-outer, y-inner): out[.., j, i] where j is
        # the x window index — matches the reference (see corr_lookup doc).
        # precision=HIGHEST: default f32 einsum runs bf16 passes here
        # (measured 0.4% rel error vs the gather path); exactness is free at
        # this size.
        sampled = jnp.einsum("bnir,bnrs,bnjs->bnji", Wy, window, Wx,
                             precision=jax.lax.Precision.HIGHEST)
        outs.append(sampled.reshape(B, H, W, d * d))
    return jnp.concatenate(outs, axis=-1)

