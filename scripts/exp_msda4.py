"""Round-3 MSDA experiment: ONE-HOT GENERATION ON THE MXU (bitplane match).

The shipped kernel is construction-bound: building Ha/Lb one-hots via
iota-compare-select costs ~30 of 37 ms (bf16, B=8, 640px encoder) — Mosaic
lowers broadcasted 3D selects ~5x above the VPU op-count floor. This
experiment replaces every compare with a matmul:

  one_hot(idx)[m] weighted by cw  ==  relu(U' @ W')
  U'[j, :] = [cw_j * (2 bits(idx_j) - 1), cw_j]      (K = nbits + 1 cols)
  W'[:, m] = [2 bits(m) - 1, -(nbits - 1)]

A matched row scores cw*nbits - (nbits-1)*cw = cw exactly (f32 accumulate
of exact products); any mismatched bit drops the score to <= -cw < 0, so
relu() zeroes it. Requires cw >= 0 — true here (softmax attention x
bilinear weights, OOB corners pre-zeroed). No iota, no select, no
broadcast: the one-hot comes OUT of the MXU in matmul-output layout.

Variants:
  bp    — bitplane Ha and Lb, transposed epilogue dots (shipped orientation)
  bpv0  — bitplane, v0-orientation epilogue (contract j on dim 1)
  bphalf— bitplane Ha only, shipped compare-select Lb (isolates which side)

Baseline to beat: shipped pallas kernel 37.2 ms encoder / 1.5 ms decoder
(bf16, B=8, 640px). Usage: python scripts/exp_msda4.py [--b 8] [--dtype bf16]
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
        _LANE, _pad_hw, _level_starts, _pad_value_levels,
        _corner_indices_weights, _pad_q)

    def _bits_pm1(v, nbits, dtype):
        """(..., ) int32 -> (..., nbits) float in {-1, +1}."""
        cols = [(jnp.bitwise_and(jnp.right_shift(v, b), 1) * 2 - 1)
                for b in range(nbits)]
        return jnp.stack(cols, axis=-1).astype(dtype)

    def _wmat(n, nbits, dtype):
        """(nbits + 1, n) bitplane match matrix, built from iota in-kernel
        (pallas kernels cannot capture materialized array constants)."""
        m = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        rows = [jnp.bitwise_and(jnp.right_shift(m, b), 1) * 2 - 1
                for b in range(nbits)]
        rows.append(m * 0 - (nbits - 1))
        return jnp.concatenate(rows, axis=0).astype(dtype)

    def _kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P):
        Tq = idx_ref.shape[3]
        L = len(shapes)
        mm = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm == jnp.float32 else None
        Len_p = value_ref.shape[2]
        Mtot = Len_p // _LANE
        nb_m = max(1, (Mtot - 1).bit_length())
        nb_l = 7

        his, los, cws = [], [], []
        for lvl in range(L):
            gidx = idx_ref[0, 0, lvl] + starts[lvl]
            hi = gidx // _LANE
            his.append(hi)
            los.append(gidx - hi * _LANE)
            cws.append(cw_ref[0, 0, lvl])
        hi = jnp.concatenate(his, axis=1)               # (Tq, nJ)
        lo = jnp.concatenate(los, axis=1)
        cw = jnp.concatenate(cws, axis=1)
        nJ = hi.shape[1]

        # U' rows: [cw * bits(idx), cw]; weight folded into the match so
        # relu(U' @ W') == cw * one_hot directly (cw >= 0 everywhere)
        Um = jnp.concatenate([_bits_pm1(hi, nb_m, jnp.float32)
                              * cw[:, :, None], cw[:, :, None]], -1)
        Ul = jnp.concatenate([_bits_pm1(lo, nb_l, jnp.float32),
                              jnp.ones_like(lo, jnp.float32)[:, :, None]], -1)
        Wm = _wmat(Mtot, nb_m, jnp.float32)             # (Km, Mtot)
        Wl = _wmat(_LANE, nb_l, jnp.float32)            # (Kl, 128)

        if variant == "bphalf":
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
            HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
        else:
            Sa = jax.lax.dot_general(
                Um.reshape(Tq * nJ, nb_m + 1), Wm,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)    # (Tq*nJ, Mtot)
            Ha = jax.nn.relu(Sa).reshape(Tq, nJ, Mtot)
            HaT = Ha.transpose(0, 2, 1) if variant != "bpv0" else Ha
        Sl = jax.lax.dot_general(
            Ul.reshape(Tq * nJ, nb_l + 1), Wl,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)        # (Tq*nJ, 128)
        Lb = jax.nn.relu(Sl).reshape(Tq, nJ, _LANE)

        if variant == "bpv0":
            coeff = jax.lax.dot_general(
                HaT.astype(mm), Lb.astype(mm),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)                          # (Tq, Mtot, 128)
        else:
            LbT = Lb.transpose(0, 2, 1)
            coeff = jax.lax.dot_general(
                HaT.astype(mm), LbT.astype(mm),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)                          # (Tq, Mtot, 128)
        coeff = coeff.reshape(Tq, Len_p).astype(mm)
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm),
                          preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1, 4))
    def fwd(value, value_spatial_shapes, sampling_locations,
            attention_weights, interpret=False):
        import jax.numpy as jnp
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
            out_specs=pl.BlockSpec((1, 1, Tq, C), lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(value_h, idx, cw)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--variants", default="bp,bpv0,bphalf")
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
        val = jnp.asarray(value_np[:1], jnp.float32)
        Lq = Len_v
        loc = jnp.asarray(rng.rand(1, Lq, nH, L, P, 2), jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(1, Lq, nH, L * P), jnp.float32),
            -1).reshape(1, Lq, nH, L, P)
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
