"""Round-4 MSDA head-fused kernel experiment.

The Tq ablation (exp_msda_tq.py: 86.1 / 83.7 / 83.9 ms at Tq=64/128/256,
B=16 encoder) proved the kernel is NOT MXU-granularity bound — the cost is
per-program fixed work (iota generation, compare-select lane padding,
launch overhead) replicated across the (B, nH, Lq/Tq) = 21760-program
grid. This variant collapses the head axis INTO the program: grid
(B, Lq/Tq), all 8 heads looped in-kernel with the iota planes generated
ONCE and shared, per-head one-hot dots and sampling matmuls unchanged
(the round-3 measured-best transposed construction), and the output
written directly in (B, Lq, nH, C) order (no post-kernel transpose).
8x fewer programs, 8x less iota work, same FLOPs.

Steps: parity f32 vs ms_deform_attn_lax (small + production shapes),
then timing vs the shipped per-(b,h) kernel at B=16 640px encoder dims.
Decision: port into ops/pallas/ms_deform_attn_kernel.py if it wins.

Usage: python scripts/exp_msda_hf.py [--batch 16] [--size 640]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, v0, iters=6, label=""):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    fetch(fn(v0))

    def run(n):
        v = v0
        t0 = time.perf_counter()
        for _ in range(n):
            v = fn(v)
        fetch(v)
        return time.perf_counter() - t0

    run(2)
    t1 = run(iters)
    t2 = run(2 * iters)
    dt = max(t2 - t1, 1e-9) / iters * 1e3
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def _hf_kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P):
    """Head-fused grid step: (B, Lq//Tq). Blocks:
    value_ref (1, nH, Len_p, C); idx/cw (1, nH, L, Tq, 4P);
    out_ref (1, Tq, nH, C)."""
    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _LANE, _DENSE_MAX, _pad_hw, _coeff_plane)

    nH = value_ref.shape[1]
    Tq = idx_ref.shape[3]
    mm_dtype = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
        else jnp.float32
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None

    big = [lvl for lvl, (h, w) in enumerate(shapes) if h * w > _DENSE_MAX]
    small = [lvl for lvl, (h, w) in enumerate(shapes)
             if h * w <= _DENSE_MAX]
    assert big == list(range(len(big))), shapes
    if big:
        end = starts[len(big) - 1] + _pad_hw(
            shapes[len(big) - 1][0] * shapes[len(big) - 1][1])
        Mtot = end // _LANE
        nJ = 4 * P * len(big)
        # iota planes generated ONCE, shared by all heads (the point of
        # the head-fused layout)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)

    accs = []
    for h in range(nH):
        parts = []
        if big:
            his, los, cws = [], [], []
            for lvl in big:
                gidx = idx_ref[0, h, lvl] + starts[lvl]
                hi = gidx // _LANE
                his.append(hi)
                los.append(gidx - hi * _LANE)
                cws.append(cw_ref[0, h, lvl])
            hi = jnp.concatenate(his, axis=1)
            lo = jnp.concatenate(los, axis=1)
            cw = jnp.concatenate(cws, axis=1)
            HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
            LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)
            coeff_big = jax.lax.dot_general(
                HaT.astype(mm_dtype), LbT.astype(mm_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)
            parts.append(coeff_big.reshape(Tq, end).astype(mm_dtype))
        for lvl in small:
            H_l, W_l = shapes[lvl]
            parts.append(_coeff_plane(idx_ref[0, h, lvl], cw_ref[0, h, lvl],
                                      H_l * W_l, P, Tq, mm_dtype))
        coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
        acc = jax.lax.dot(coeff, value_ref[0, h, :, :].astype(mm_dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)
        accs.append(acc.astype(out_ref.dtype))
    # ONE lane-aligned (Tq, nH*C) write: a per-head out_ref[0, :, h, :]
    # 32-lane slice write crashes the compile helper on the bf16 path
    # (packed (16,128) tiling), and the concat matches the op's final
    # (B, Lq, nH*C) layout anyway
    out_ref[0] = jnp.concatenate(accs, axis=-1)


def ms_deform_attn_hf(value, value_spatial_shapes, sampling_locations,
                      attention_weights, tile_q=128, interpret=False,
                      vmem_limit_bytes=100 * 2**20):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _level_starts, _pad_value_levels, _pad_q, _corner_indices_weights)

    B, Len_v, nH, C = value.shape
    Lq = sampling_locations.shape[1]
    L = len(value_spatial_shapes)
    P = sampling_locations.shape[4]
    shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
    starts = _level_starts(shapes)

    Tq = min(tile_q, Lq)
    loc, w, Lq_p = _pad_q(sampling_locations, attention_weights, Lq, Tq)
    value_h = _pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
    Len_p = value_h.shape[2]
    idx, cw = _corner_indices_weights(shapes, loc, w)
    if not interpret:
        value_h, idx, cw = jax.lax.optimization_barrier((value_h, idx, cw))

    kernel = functools.partial(_hf_kernel, shapes=shapes, starts=starts,
                               P=P)
    out = pl.pallas_call(
        kernel,
        grid=(B, Lq_p // Tq),
        in_specs=[
            pl.BlockSpec((1, nH, Len_p, C), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nH, L, Tq, 4 * P),
                         lambda b, t: (b, 0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nH, L, Tq, 4 * P),
                         lambda b, t: (b, 0, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, nH * C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq_p, nH * C), value.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes),
    )(value_h, idx, cw)
    return out[:, :Lq]


def softmax_w(rng, B, Lq, nH, L, P):
    import jax
    import jax.numpy as jnp
    raw = jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32)
    return jax.nn.softmax(raw, axis=-1).reshape(B, Lq, nH, L, P)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tq", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        ms_deform_attn_pallas)
    interp = jax.default_backend() == "cpu"
    print(f"backend={jax.default_backend()}", flush=True)

    rng = np.random.RandomState(0)
    nH, C, P = 8, 32, 4

    # ---- parity f32, small dims ----
    shp_s = ((20, 20), (10, 10))
    Lv = sum(h * w for h, w in shp_s)
    Lq = 300
    value = jnp.asarray(rng.randn(2, Lv, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(2, Lq, nH, len(shp_s), P, 2) * 1.2 - 0.1,
                      jnp.float32)
    w = softmax_w(rng, 2, Lq, nH, len(shp_s), P)
    with jax.default_device(jax.devices('cpu')[0]):
        ref = np.asarray(ms_deform_attn_lax(value, shp_s, loc, w))
    sc = np.abs(ref).max()
    got = np.asarray(ms_deform_attn_hf(value, shp_s, loc, w, args.tq,
                                       interp))
    d = np.abs(ref - got).max() / sc
    print(f"hf parity f32 small: rel {d:.2e}"
          f"{'' if d < 1e-5 else '  <-- FAIL'}", flush=True)
    assert d < 1e-5

    # ---- parity f32, production level pyramid (B=2 to keep the CPU
    # oracle cheap) ----
    lvls = tuple((args.size // s, args.size // s) for s in (8, 16, 32, 64))
    Lv = sum(h * w for h, w in lvls)
    value = jnp.asarray(rng.randn(2, Lv, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(2, Lv, nH, len(lvls), P, 2), jnp.float32)
    w = softmax_w(rng, 2, Lv, nH, len(lvls), P)
    with jax.default_device(jax.devices('cpu')[0]):
        ref = np.asarray(ms_deform_attn_lax(value, lvls, loc, w))
    sc = np.abs(ref).max()
    got = np.asarray(ms_deform_attn_hf(value, lvls, loc, w, args.tq,
                                       interp))
    d = np.abs(ref - got).max() / sc
    print(f"hf parity f32 production: rel {d:.2e}"
          f"{'' if d < 1e-5 else '  <-- FAIL'}", flush=True)
    assert d < 1e-5

    # ---- timing, bf16 encoder dims ----
    B = args.batch
    value = jnp.asarray(rng.randn(B, Lv, nH, C), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Lv, nH, len(lvls), P, 2), jnp.float32)
    w = softmax_w(rng, B, Lv, nH, len(lvls), P)
    print(f"encoder dims: B={B} levels={lvls} Len_v=Lq={Lv}", flush=True)

    f_ship = jax.jit(lambda v: v + ms_deform_attn_pallas(
        v, lvls, loc, w, 64, interp
    ).reshape(B, Lv, nH, C).astype(v.dtype) * 1e-9)
    timed(f_ship, value, label="shipped per-(b,h) Tq=64")

    for tq in (64, args.tq):
        f_hf = jax.jit(lambda v, tq=tq: v + ms_deform_attn_hf(
            v, lvls, loc, w, tq, interp
        ).reshape(B, Lv, nH, C).astype(v.dtype) * 1e-9)
        try:
            timed(f_hf, value, label=f"head-fused Tq={tq}")
        except Exception as e:
            print(f"head-fused Tq={tq}: FAILED "
                  f"({str(e).splitlines()[0][:160]})", flush=True)


if __name__ == "__main__":
    main()
