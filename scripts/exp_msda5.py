"""Round-3 MSDA experiment: HEADS-IN-LANES construction + bf16 compares.

The shipped kernel (transposed construction, exp_msda2 winner) builds per
(b, h) tile: HaT (Tq, Mtot, nJ=48) and LbT (Tq, 128, nJ=48) — 48 of 128
lanes used, so every select pass wastes 62% of each vreg row. Two
orthogonal fixes timed here:

1. heads-in-lanes (`hl`): grid (B, Lq//Tq) with ALL nH heads in the block;
   per level the lane axis packs (head, corner) = nH*4P = 8*16 = 128 lanes
   EXACTLY. One select pass builds every head's one-hot at full lane
   utilization; the coeff dot then slices 16 lanes per head (static).
   Levels are handled uniformly (each lane-padded level reshapes to
   (M_l, 128); the 10x10 level is just M=1).

2. bf16 compares (`*b` variants): the one-hot compares run on int32 vregs
   (4 sublanes x 128 lanes per vreg); hi < Mtot <= 67 and lo < 128 are
   exact in bfloat16, and bf16 vregs pack 2x the elements — casting the
   iota and the operands to bf16 should roughly halve the select cost if
   Mosaic keeps the packed layout. `shb` applies ONLY this change to the
   shipped per-(b,h) layout (2-line delta, lowest-risk win).

Variants: hl, hlb (hl + bf16 compares), shb (shipped layout + bf16
compares). Baseline to beat: shipped kernel 37.2 ms encoder (bf16, B=8,
640px levels 80/40/20/10).

Usage: python scripts/exp_msda5.py [--parity] [--b 8] [--dtype bf16]
"""

import argparse
import functools
import time

import numpy as np


def timed(fn, x0, iters=8, label=""):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    fetch(fn(x0))

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        fetch(x)
        return time.perf_counter() - t0

    run(2)
    t1 = run(iters)
    t2 = run(2 * iters)
    dt = max(t2 - t1, 1e-9) / iters
    print(f"{label}: {dt * 1000:.3f} ms/call", flush=True)
    return dt


_LANE = 128


def build_hl(bf16_cmp, tile_q=64, interpret=False):
    """Heads-in-lanes variant; returns fn(value, shapes, loc, w)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _pad_hw, _level_starts, _pad_value_levels, _pad_q,
        _corner_indices_weights)

    def _kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P,
                nH, C):
        # value_ref: (1, nH, Len_p, C); idx/cw: (1, L, Tq, nH*4P)
        # out_ref: (1, Tq, nH*C)
        Tq = idx_ref.shape[2]
        L = len(shapes)
        nJh = idx_ref.shape[3]          # nH * 4P = 128
        mm = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm == jnp.float32 else None
        cmp_t = jnp.bfloat16 if bf16_cmp else jnp.int32

        # per-level factored one-hots at full 128-lane utilization
        coeff_lvls = []                  # per level: (Tq, M_l*128) per head
        for lvl in range(L):
            HW = shapes[lvl][0] * shapes[lvl][1]
            M = _pad_hw(HW) // _LANE
            idx_l = idx_ref[0, lvl]                       # (Tq, 128)
            cw_l = cw_ref[0, lvl]
            hi = idx_l // _LANE                           # < M <= 50
            lo = idx_l - hi * _LANE                       # < 128
            iota_m = jax.lax.broadcasted_iota(cmp_t, (Tq, M, nJh), 1)
            iota_l = jax.lax.broadcasted_iota(cmp_t, (Tq, _LANE, nJh), 1)
            HaT = jnp.where(iota_m == hi.astype(cmp_t)[:, None, :],
                            cw_l[:, None, :], 0.0)        # (Tq, M, 128)
            LbT = jnp.where(iota_l == lo.astype(cmp_t)[:, None, :],
                            1.0, 0.0)                     # (Tq, 128, 128)
            coeff_lvls.append((HaT, LbT, M))

        # per head: slice 4P lanes, batched dot per level, assemble, sample
        for h in range(nH):
            sl = slice(h * 4 * P, (h + 1) * 4 * P)
            parts = []
            for lvl in range(L):
                HaT, LbT, M = coeff_lvls[lvl]
                c = jax.lax.dot_general(
                    HaT[:, :, sl].astype(mm), LbT[:, :, sl].astype(mm),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=prec)                       # (Tq, M, 128)
                parts.append(c.reshape(Tq, M * _LANE).astype(mm))
            coeff = parts[0] if len(parts) == 1 \
                else jnp.concatenate(parts, axis=1)       # (Tq, Len_p)
            acc = jax.lax.dot(coeff, value_ref[0, h, :, :].astype(mm),
                              preferred_element_type=jnp.float32,
                              precision=prec)
            out_ref[0, :, h * C:(h + 1) * C] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1,))
    def fn(value, shapes, loc, w):
        B, Len_v, nH, C = value.shape
        Lq = loc.shape[1]
        L = len(shapes)
        P = loc.shape[4]
        starts = _level_starts(shapes)
        Tq = min(tile_q, Lq)
        loc_p, w_p, Lq_p = _pad_q(loc, w, Lq, Tq)
        idx, cw = _corner_indices_weights(shapes, loc_p, w_p)
        # (B, nH, L, Lq_p, 4P) -> (B, L, Lq_p, nH*4P)
        idx = idx.transpose(0, 2, 3, 1, 4).reshape(B, L, Lq_p, nH * 4 * P)
        cw = cw.transpose(0, 2, 3, 1, 4).reshape(B, L, Lq_p, nH * 4 * P)
        value_h = _pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
        Len_p = value_h.shape[2]
        if not interpret:
            value_h, idx, cw = jax.lax.optimization_barrier(
                (value_h, idx, cw))
        kernel = functools.partial(_kernel, shapes=shapes, starts=starts,
                                   P=P, nH=nH, C=C)
        out = pl.pallas_call(
            kernel,
            grid=(B, Lq_p // Tq),
            in_specs=[
                pl.BlockSpec((1, nH, Len_p, C), lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, Tq, nH * 4 * P),
                             lambda b, t: (b, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, Tq, nH * 4 * P),
                             lambda b, t: (b, 0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Tq, nH * C),
                                   lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Lq_p, nH * C), value.dtype),
            interpret=interpret,
        )(value_h, idx, cw)
        return out[:, :Lq]

    return fn


def build_shb(tile_q=64, interpret=False):
    """Shipped per-(b,h) layout but with bf16 compares."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas import ms_deform_attn_kernel as K

    def _kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P):
        Tq = idx_ref.shape[3]
        mm = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm == jnp.float32 else None
        big = [lvl for lvl, (h, w) in enumerate(shapes)
               if h * w > K._DENSE_MAX]
        small = [lvl for lvl, (h, w) in enumerate(shapes)
                 if h * w <= K._DENSE_MAX]
        parts = []
        if big:
            end = starts[len(big) - 1] + K._pad_hw(
                shapes[len(big) - 1][0] * shapes[len(big) - 1][1])
            Mtot = end // _LANE
            his, los, cws = [], [], []
            for lvl in big:
                gidx = idx_ref[0, 0, lvl] + starts[lvl]
                hi = gidx // _LANE
                his.append(hi)
                los.append(gidx - hi * _LANE)
                cws.append(cw_ref[0, 0, lvl])
            hi = jnp.concatenate(his, axis=1)
            lo = jnp.concatenate(los, axis=1)
            cw = jnp.concatenate(cws, axis=1)
            nJ = hi.shape[1]
            # ONLY change vs shipped: compares in bf16 (exact: hi < 67,
            # lo < 128 both < 256 = bf16-exact integer range)
            iota_m = jax.lax.broadcasted_iota(jnp.bfloat16, (Tq, Mtot, nJ),
                                              1)
            iota_l = jax.lax.broadcasted_iota(jnp.bfloat16, (Tq, _LANE, nJ),
                                              1)
            HaT = jnp.where(iota_m == hi.astype(jnp.bfloat16)[:, None, :],
                            cw[:, None, :], 0.0)
            LbT = jnp.where(iota_l == lo.astype(jnp.bfloat16)[:, None, :],
                            1.0, 0.0)
            coeff_big = jax.lax.dot_general(
                HaT.astype(mm), LbT.astype(mm),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)
            parts.append(coeff_big.reshape(Tq, end).astype(mm))
        for lvl in small:
            H_l, W_l = shapes[lvl]
            parts.append(K._coeff_plane(idx_ref[0, 0, lvl],
                                        cw_ref[0, 0, lvl],
                                        H_l * W_l, P, Tq, mm))
        coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm),
                          preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1,))
    def fn(value, shapes, loc, w):
        B, Len_v, nH, C = value.shape
        Lq = loc.shape[1]
        L = len(shapes)
        P = loc.shape[4]
        starts = K._level_starts(shapes)
        Tq = min(tile_q, Lq)
        loc_p, w_p, Lq_p = K._pad_q(loc, w, Lq, Tq)
        idx, cw = K._corner_indices_weights(shapes, loc_p, w_p)
        value_h = K._pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
        Len_p = value_h.shape[2]
        if not interpret:
            value_h, idx, cw = jax.lax.optimization_barrier(
                (value_h, idx, cw))
        kernel = functools.partial(_kernel, shapes=shapes, starts=starts,
                                   P=P)
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
            out_specs=pl.BlockSpec((1, 1, Tq, C),
                                   lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
            interpret=interpret,
        )(value_h, idx, cw)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--variants", default="pbh,phl,phlb,hl,hlb,shb")
    ap.add_argument("--tile-q", type=int, default=64)
    ap.add_argument("--decoder", action="store_true",
                    help="Lq=300 decoder shape instead of the encoder")
    args = ap.parse_args()

    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax

    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    Len_v = sum(h * w for h, w in shapes)
    nH, C, P = 8, 32, 4
    B = args.b
    Lq = 300 if args.decoder else Len_v
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), dt)
    loc = jnp.asarray(rng.rand(B, Lq, nH, len(shapes), P, 2), jnp.float32)
    w = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, nH, len(shapes) * P), jnp.float32),
        -1).reshape(B, Lq, nH, len(shapes), P)

    def build_prod(layout):
        from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
            ms_deform_attn_pallas)

        def _mk(interp):
            return lambda v, s, l, a: ms_deform_attn_pallas(
                v, s, l, a, args.tile_q, interp, layout=layout)
        return _mk

    builders = {
        "hl": lambda interp: build_hl(False, args.tile_q, interp),
        "hlb": lambda interp: build_hl(True, args.tile_q, interp),
        "shb": lambda interp: build_shb(args.tile_q, interp),
        # the PRODUCTION kernel's two layouts (ms_deform_attn_kernel.py) —
        # these are what the model actually ships
        "pbh": build_prod("bh"),
        "phl": build_prod("hl"),
        "phlb": build_prod("hlb"),
    }

    if args.parity:
        want = ms_deform_attn_lax(
            value.astype(jnp.float32), shapes, loc, w)
        for name in args.variants.split(","):
            fn = builders[name](args.cpu)  # interpret on cpu
            got = fn(value.astype(jnp.float32), shapes, loc, w)
            d = float(jnp.abs(got - want).max())
            s = float(jnp.abs(want).max())
            print(f"parity {name}: maxdiff {d:.2e} (scale {s:.1f})",
                  flush=True)
        return

    for name in args.variants.split(","):
        fn = builders[name](False)
        timed(lambda v, fn=fn: _chain(fn, v, shapes, loc, w),
              value, label=f"{name} B={B} {args.dtype}")


def _chain(fn, v, shapes, loc, w):
    """Data-dependent chain: out feeds back into value so repeated calls
    can't be deduped (tunnel timing rule, DEVELOPMENT.md)."""
    import jax.numpy as jnp
    out = fn(v, shapes, loc, w)                    # (B, Lq, nH*C)
    delta = (out.sum() * 1e-12).astype(v.dtype)
    return v + delta


if __name__ == "__main__":
    main()
