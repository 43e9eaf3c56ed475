"""Round-3 MSDA micro-ablation: WHICH one-hot construction layout does
Mosaic lower fast?

Round-2 showed the pallas MSDA forward is construction-bound (~68 of 87 ms
bf16 at B=8 640px encoder). The construction builds Ha (Tq, nJ, Mtot) and
Lb (Tq, nJ, 128) via iota-compare-select; suspicion is the 3D broadcast
layout (hi[:, :, None] moves j lanes->sublanes) lowers badly. Variants time
the SAME element count in different layouts, inside one pallas kernel at the
production grid, with the same batched-dot + sampling matmul epilogue:

  v0    — shipped layout: iota dim 2, hi[:, :, None]      (baseline)
  tr    — transposed: Ha_T (Tq, Mtot, nJ) iota dim 1, hi[:, None, :]
          stays lane-resident; batched dot contracts the lane dim
  fl    — flat 2D: (Tq*nJ, Mtot)/(Tq*nJ, 128) wheres from column vectors
          (faked tile-constant columns — timing only), reshape to 3D + dot
  cons  — v0 construction ONLY (sum-reduce epilogue, no matmuls)
  construns — tr construction ONLY
  consfl    — fl construction ONLY (no reshape, no dot)

Usage: python scripts/exp_msda2.py [--lq 6400] [--dtype bf16]
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


def build(variant, tile_q=64):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _LANE, _DENSE_MAX, _pad_hw, _level_starts, _pad_value_levels,
        _pad_q, _corner_indices_weights)

    def _kernel(value_ref, idx_ref, cw_ref, gc_ref, cc_ref, out_ref, *,
                shapes, starts, P):
        Tq = idx_ref.shape[3]
        mm = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        big = [lvl for lvl, (h, w) in enumerate(shapes)
               if h * w > _DENSE_MAX]
        end = starts[len(big) - 1] + _pad_hw(
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

        if variant in ("v0", "cons"):
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, nJ, Mtot), 2)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, nJ, _LANE), 2)
            Ha = jnp.where(iota_m == hi[:, :, None], cw[:, :, None], 0.0)
            Lb = jnp.where(iota_l == lo[:, :, None], 1.0, 0.0)
            if variant == "cons":
                out_ref[0, 0, :, :] = (
                    Ha.sum(axis=(1, 2))[:, None]
                    + Lb.sum(axis=(1, 2))[:, None]
                    + jnp.zeros_like(out_ref[0, 0])).astype(out_ref.dtype)
                return
            coeff = jax.lax.dot_general(
                Ha.astype(mm), Lb.astype(mm), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            coeff = coeff.reshape(Tq, end).astype(mm)
        elif variant in ("tr", "construns"):
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)
            HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
            LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)
            if variant == "construns":
                out_ref[0, 0, :, :] = (
                    HaT.sum(axis=(1, 2))[:, None]
                    + LbT.sum(axis=(1, 2))[:, None]
                    + jnp.zeros_like(out_ref[0, 0])).astype(out_ref.dtype)
                return
            coeff = jax.lax.dot_general(
                HaT.astype(mm), LbT.astype(mm), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (Tq, Mtot, 128)
            coeff = coeff.reshape(Tq, end).astype(mm)
        elif variant in ("fl", "consfl"):
            g_c = gc_ref[0, 0]                         # (Tq*nJ, 1) faked
            c_c = cc_ref[0, 0]
            hi_c = g_c // _LANE
            lo_c = g_c - hi_c * _LANE
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq * nJ, Mtot), 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq * nJ, _LANE), 1)
            Ha2 = jnp.where(iota_m == hi_c, c_c, 0.0)
            Lb2 = jnp.where(iota_l == lo_c, 1.0, 0.0)
            if variant == "consfl":
                out_ref[0, 0, :, :] = (
                    Ha2.sum(axis=1).reshape(Tq, nJ).sum(axis=1)[:, None]
                    + Lb2.sum(axis=1).reshape(Tq, nJ).sum(axis=1)[:, None]
                    + jnp.zeros_like(out_ref[0, 0])).astype(out_ref.dtype)
                return
            Ha = Ha2.reshape(Tq, nJ, Mtot)
            Lb = Lb2.reshape(Tq, nJ, _LANE)
            coeff = jax.lax.dot_general(
                Ha.astype(mm), Lb.astype(mm), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            coeff = coeff.reshape(Tq, end).astype(mm)
        else:
            raise ValueError(variant)

        # small levels: dense path unchanged
        parts = [coeff]
        for lvl in range(len(big), len(shapes)):
            H_l, W_l = shapes[lvl]
            HW = H_l * W_l
            HWp = _pad_hw(HW)
            iota = jax.lax.broadcasted_iota(jnp.int32, (Tq, HWp), 1)
            cf = jnp.zeros((Tq, HWp), jnp.float32)
            ti = idx_ref[0, 0, lvl]
            tc = cw_ref[0, 0, lvl]
            for j in range(4 * P):
                cf = cf + jnp.where(iota == ti[:, j:j + 1],
                                    tc[:, j:j + 1], 0.0)
            parts.append(cf.astype(mm))
        coeff = jnp.concatenate(parts, axis=1)
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm),
                          preferred_element_type=jnp.float32)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1,))
    def fwd(value, value_spatial_shapes, sampling_locations,
            attention_weights):
        B, Len_v, nH, C = value.shape
        Lq = sampling_locations.shape[1]
        L = len(value_spatial_shapes)
        P = sampling_locations.shape[4]
        shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
        starts = _level_starts(shapes)
        Tq = min(tile_q, Lq)
        loc, w, Lq_p = _pad_q(sampling_locations, attention_weights, Lq, Tq)
        idx, cw = _corner_indices_weights(shapes, loc, w)
        value_h = _pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
        Len_p = value_h.shape[2]
        nbig = sum(1 for (h, w_) in shapes if h * w_ > _DENSE_MAX)
        nJ = 4 * P * nbig
        # TILE-CONSTANT fake columns (timing only; avoids the 128x padded
        # (B, nH, Lq_p*nJ, 1) layout that OOMs HBM — the real fix is a
        # separate question; this isolates construction cost)
        gc = jnp.tile(jnp.arange(Tq * nJ, dtype=jnp.int32)[None, None, :, None]
                      % 977, (B, nH, 1, 1))
        cc = jnp.ones((B, nH, Tq * nJ, 1), jnp.float32)

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
                pl.BlockSpec((1, 1, Tq * nJ, 1), lambda b, h, t: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tq * nJ, 1), lambda b, h, t: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, Tq, C), lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
        )(value_h, idx, cw, gc, cc)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lq", type=int, default=6400)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--variants",
                    default="v0,tr,fl,cons,construns,consfl")
    ap.add_argument("--tile", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, nH, C, P = 8, 8, 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    Len_v = sum(h * w for h, w in shapes)
    L = len(shapes)
    Lq = args.lq
    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), dtype)
    loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), dtype)
    w = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32),
        -1).reshape(B, Lq, nH, L, P).astype(dtype)

    for name in args.variants.split(","):
        f = build(name, args.tile)
        fn = jax.jit(lambda v, i=f: (
            i(v, shapes, loc, w).sum(axis=(1, 2))[:, None, None, None] * 1e-9
            + v))
        try:
            timed(fn, value, label=f"{args.dtype} Lq={Lq} {name}")
        except Exception as e:
            print(f"{args.dtype} Lq={Lq} {name} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
