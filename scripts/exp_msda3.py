"""Round-3 MSDA kernel experiment: SEPARABLE ROW-PADDED formulation.

Idea: pad every level's rows to 128 lanes so the flat padded index is
hw = (row_start + y) * 128 + x — the factored digits ARE (y, x). Bilinear
weights are separable (corner weight = wy-part * wx-part), so each sample
point contributes ONE rank-1 outer product:

  coeff[q, Y, x] = sum_j Ya[q, j, Y] * Xb[q, j, x]        j = (level, point)
  Ya[q, j, :] = attn_w * [(1-wy) at y0+start, wy at y0+1+start]
  Xb[q, j, :] = [(1-wx) at x0, wx at x0+1]

vs the shipped kernel's FOUR weighted one-hots per point. Out-of-bounds
corners vanish automatically: a negative / too-large index never matches
the iota (y) and the x padding columns [W, 128) hold zero values — no
clipping, no validity masks anywhere.

The combine is one batched (Hsum, LP) @ (LP, 128) MXU dot per query tile
(all levels share it: points of level l have zero Ya outside level-l rows),
then sampling stays one (Tq, Hsum*128) @ (Hsum*128, C) matmul.

Variants: sepA (iota on lanes, indices sublane-resident),
          sepB (transposed: iota on sublanes, indices lane-resident —
                the layout that won in exp_msda2).

Usage: python scripts/exp_msda3.py [--parity] [--b 8] [--dtype bf16]
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


def build(variant, tile_q=64):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _kernel(value_ref, ii_ref, ff_ref, out_ref, *, shapes, ystarts, P):
        L = len(shapes)
        Tq = ii_ref.shape[3]
        mm = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm == jnp.float32 else None
        Hsum = sum(h for h, _ in shapes)

        # gather per-level packs into (Tq, L*P) planes
        ys, xs, ya0, ya1, xb0, xb1 = [], [], [], [], [], []
        for lvl in range(L):
            ys.append(ii_ref[0, 0, lvl, :, :P] + ystarts[lvl])
            xs.append(ii_ref[0, 0, lvl, :, P:2 * P])
            ya0.append(ff_ref[0, 0, lvl, :, 0 * P:1 * P])
            ya1.append(ff_ref[0, 0, lvl, :, 1 * P:2 * P])
            xb0.append(ff_ref[0, 0, lvl, :, 2 * P:3 * P])
            xb1.append(ff_ref[0, 0, lvl, :, 3 * P:4 * P])
        ys = jnp.concatenate(ys, axis=1)               # (Tq, LP)
        xs = jnp.concatenate(xs, axis=1)
        ya0 = jnp.concatenate(ya0, axis=1)
        ya1 = jnp.concatenate(ya1, axis=1)
        xb0 = jnp.concatenate(xb0, axis=1)
        xb1 = jnp.concatenate(xb1, axis=1)
        LP = ys.shape[1]

        if variant.startswith("sepB_"):
            # ablation variants: skip pieces of sepB to locate the cost
            ioy = jax.lax.broadcasted_iota(jnp.int32, (Tq, Hsum, LP), 1)
            iox = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, LP), 1)
            mode = variant.split("_", 1)[1]
            if mode == "noonehot":  # constant planes, keep both dots
                YaT = (ya0[:, None, :] + ya1[:, None, :]) * \
                    jnp.ones((1, Hsum, 1), jnp.float32)
                XbT = (xb0[:, None, :] + xb1[:, None, :]) * \
                    jnp.ones((1, _LANE, 1), jnp.float32)
            else:
                YaT = (jnp.where(ioy == ys[:, None, :], ya0[:, None, :], 0.0)
                       + jnp.where(ioy == ys[:, None, :] + 1,
                                   ya1[:, None, :], 0.0))
                XbT = (jnp.where(iox == xs[:, None, :], xb0[:, None, :], 0.0)
                       + jnp.where(iox == xs[:, None, :] + 1,
                                   xb1[:, None, :], 0.0))
            if mode == "nocoeff":   # skip the batched coeff dot
                coeff = YaT[:, :, 0:1] * XbT[:, 0:1, :].transpose(0, 2, 1) \
                    + jnp.zeros((Tq, Hsum, _LANE), jnp.float32)
            else:
                coeff = jax.lax.dot_general(
                    YaT.astype(mm), XbT.astype(mm),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec)
            if mode == "nosamp":    # skip the sampling matmul
                out_ref[0, 0, :, :] = coeff[:, 0, :C].astype(out_ref.dtype)
                return
            coeff = coeff.reshape(Tq, Hsum * _LANE).astype(mm)
            acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm),
                              preferred_element_type=jnp.float32,
                              precision=prec)
            out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)
            return
        if variant == "sepA":
            ioy = jax.lax.broadcasted_iota(jnp.int32, (Tq, LP, Hsum), 2)
            iox = jax.lax.broadcasted_iota(jnp.int32, (Tq, LP, _LANE), 2)
            Ya = (jnp.where(ioy == ys[:, :, None], ya0[:, :, None], 0.0)
                  + jnp.where(ioy == ys[:, :, None] + 1, ya1[:, :, None], 0.0))
            Xb = (jnp.where(iox == xs[:, :, None], xb0[:, :, None], 0.0)
                  + jnp.where(iox == xs[:, :, None] + 1, xb1[:, :, None], 0.0))
            coeff = jax.lax.dot_general(
                Ya.astype(mm), Xb.astype(mm),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)                        # (Tq, Hsum, 128)
        else:  # sepB transposed
            ioy = jax.lax.broadcasted_iota(jnp.int32, (Tq, Hsum, LP), 1)
            iox = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, LP), 1)
            YaT = (jnp.where(ioy == ys[:, None, :], ya0[:, None, :], 0.0)
                   + jnp.where(ioy == ys[:, None, :] + 1, ya1[:, None, :],
                               0.0))
            XbT = (jnp.where(iox == xs[:, None, :], xb0[:, None, :], 0.0)
                   + jnp.where(iox == xs[:, None, :] + 1, xb1[:, None, :],
                               0.0))
            coeff = jax.lax.dot_general(
                YaT.astype(mm), XbT.astype(mm),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)                        # (Tq, Hsum, 128)

        coeff = coeff.reshape(Tq, Hsum * _LANE).astype(mm)
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm),
                          preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    def _prep(shapes, loc, w):
        """ii (B, nH, L, Lq, 2P) int32 [y0 xP | x0 xP];
        ff (B, nH, L, Lq, 4P) f32 [a(1-wy) | a*wy | 1-wx | wx].
        Vectorized over L (no per-level slicing — round-2 miscompile
        pattern)."""
        import jax.numpy as jnp
        Ws = jnp.asarray([float(w_) for _, w_ in shapes], jnp.float32)
        Hs = jnp.asarray([float(h_) for h_, _ in shapes], jnp.float32)
        Wb = Ws[None, None, None, :, None]
        Hb = Hs[None, None, None, :, None]
        x = loc[..., 0].astype(jnp.float32) * Wb - 0.5   # (B, Lq, nH, L, P)
        y = loc[..., 1].astype(jnp.float32) * Hb - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        a = w.astype(jnp.float32)
        # y-validity MUST be masked in the weights: rows are globally packed
        # (level lvl's row r lives at ystarts[lvl]+r), so an OOB y index
        # (y0+1 == H at the bottom edge, or y0 < 0) would alias ANOTHER
        # level's real row. With the weight zeroed the kernel's where()
        # contributes 0 no matter what the index aliases; x needs no mask
        # (padded lanes [W,128) hold zero values, x<0 never matches iota).
        vy0 = ((y0 >= 0) & (y0 < Hb)).astype(jnp.float32)
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < Hb)).astype(jnp.float32)
        y0 = jnp.clip(y0, -2.0, Hb)          # keep int32 cast well-defined
        x0 = jnp.clip(x0, -2.0, float(_LANE))
        ii = jnp.concatenate([y0, x0], axis=-1).astype(jnp.int32)
        ff = jnp.concatenate([a * (1 - wy) * vy0, a * wy * vy1,
                              1 - wx, wx], axis=-1)
        # (B, Lq, nH, L, K) -> (B, nH, L, Lq, K)
        return (ii.transpose(0, 2, 3, 1, 4), ff.transpose(0, 2, 3, 1, 4))

    def _pad_rows(value, shapes):
        """(B, Len_v, nH, C) -> (B, nH, Hsum*128, C): per level reshape to
        rows and zero-pad W -> 128 lanes."""
        import jax.numpy as jnp
        B, _, nH, C = value.shape
        segs, s = [], 0
        for (h, w_) in shapes:
            seg = value[:, s:s + h * w_].transpose(0, 2, 1, 3)
            seg = seg.reshape(B, nH, h, w_, C)
            seg = jnp.pad(seg, ((0, 0), (0, 0), (0, 0), (0, _LANE - w_),
                                (0, 0)))
            segs.append(seg.reshape(B, nH, h * _LANE, C))
            s += h * w_
        return jnp.concatenate(segs, axis=2)

    @functools.partial(jax.jit, static_argnums=(1, 4))
    def fwd(value, value_spatial_shapes, sampling_locations,
            attention_weights, interpret=False):
        import jax.numpy as jnp
        B, Len_v, nH, C = value.shape
        Lq = sampling_locations.shape[1]
        L = len(value_spatial_shapes)
        P = sampling_locations.shape[4]
        shapes = tuple((int(h), int(w_)) for h, w_ in value_spatial_shapes)
        assert all(w_ <= _LANE for _, w_ in shapes), shapes
        ystarts = [0]
        for (h, _) in shapes[:-1]:
            ystarts.append(ystarts[-1] + h)
        ystarts = tuple(ystarts)
        Hsum = sum(h for h, _ in shapes)

        Tq = min(tile_q, Lq)
        pad_q = (-Lq) % Tq
        loc, w = sampling_locations, attention_weights
        if pad_q:
            loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0),
                                (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
        Lq_p = Lq + pad_q
        ii, ff = _prep(shapes, loc, w)
        value_rp = _pad_rows(value, shapes)
        value_rp, ii, ff = jax.lax.optimization_barrier((value_rp, ii, ff))

        kernel = functools.partial(_kernel, shapes=shapes, ystarts=ystarts,
                                   P=P)
        out = pl.pallas_call(
            kernel,
            grid=(B, nH, Lq_p // Tq),
            in_specs=[
                pl.BlockSpec((1, 1, Hsum * _LANE, C),
                             lambda b, h, t: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L, Tq, 2 * P),
                             lambda b, h, t: (b, h, 0, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, L, Tq, 4 * P),
                             lambda b, h, t: (b, h, 0, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, Tq, C), lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(value_rp, ii, ff)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--variants", default="sepA,sepB")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--tile", type=int, default=64)
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pre-imports jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)

    B, nH, C, P = args.b, 8, 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    Len_v = sum(h * w for h, w in shapes)
    L = len(shapes)
    rng = np.random.RandomState(0)
    value_np = rng.randn(B, Len_v, nH, C)

    variants = {name: build(name, args.tile)
                for name in args.variants.split(",")}

    if args.parity:
        interp = jax.default_backend() == "cpu"
        Bs, Lqs = 2, 300
        sh = ((16, 20), (8, 10), (4, 5))
        lv = sum(h * w for h, w in sh)
        val = jnp.asarray(rng.randn(Bs, lv, nH, C), jnp.float32)
        loc = jnp.asarray(rng.rand(Bs, Lqs, nH, 3, P, 2) * 1.4 - 0.2,
                          jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(Bs, Lqs, nH, 3 * P), jnp.float32),
            -1).reshape(Bs, Lqs, nH, 3, P)
        ref = np.asarray(ms_deform_attn_lax(val, sh, loc, w))
        for name, fn in variants.items():
            got = np.asarray(fn(val, sh, loc, w, interp))
            d = np.abs(got - ref).max()
            print(f"parity[{name}] small maxdiff {d:.2e}", flush=True)
        val = jnp.asarray(value_np, jnp.float32)
        Lq = Len_v
        loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32),
            -1).reshape(B, Lq, nH, L, P)
        ref = np.asarray(ms_deform_attn(val, shapes, loc, w, impl="fast"))
        for name, fn in variants.items():
            got = np.asarray(fn(val, shapes, loc, w, interp))
            d = np.abs(got - ref).max()
            print(f"parity[{name}] encoder maxdiff {d:.2e}", flush=True)
        return

    dtype = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    value = jnp.asarray(value_np, dtype)
    for site, Lq in (("encoder", Len_v), ("decoder", 300)):
        loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), dtype)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32),
            -1).reshape(B, Lq, nH, L, P).astype(dtype)
        for name, impl in variants.items():
            fn = jax.jit(lambda v, i=impl, l=loc, a=w: (
                i(v, shapes, l, a)
                .sum(axis=(1, 2))[:, None, None, None].astype(v.dtype) * 1e-9
                + v))
            try:
                timed(fn, value, label=f"B={B} {args.dtype} {site} {name}")
            except Exception as e:
                print(f"B={B} {args.dtype} {site} {name} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
