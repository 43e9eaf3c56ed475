"""Round-5 MSDA floor attribution (VERDICT r4 #2): where do the measured
~72 cycles/query go, given the naive sum of irreducible parts is ~35?

Method: staged copies of the shipped kernel (ops/pallas/
ms_deform_attn_kernel.py) that run only a prefix of its pipeline, timed at
encoder production dims (B=16, 640px levels, bf16, Tq=128):

  build   VPU one-hot construction only (iotas + compare-selects), matmuls
          skipped; output = max-reduce of the planes (prevents Mosaic DCE;
          the reduce's own cost is measured separately via `reduce0`)
  ctor    build + the batched construction matmul (Tq x (Mtot,nJ)@(nJ,128));
          sampling matmul skipped (output = sum-reduce of the coeff plane)
  sample  the (Tq, Len_p)@(Len_p, C) sampling matmul only, with a
          fill-constant coefficient plane (construction skipped)
  full    the shipped pipeline (cross-check: build+ctor_delta+sample should
          bracket it)

plus a C-scaling probe on `sample` (C = 32 / 64 / 128 zero-widened values):
if sampling time is flat in C, the pass is contraction-(K=Len_p)-bound and
its true cost is ~Len_p/128 cycles per query tile row — not the MAC count —
which alone accounts for the gap.

Attribution -> decision (pre-committed): if `sample` >= ~45 cycles/query,
the one-hot design's floor is genuinely ~65-75 c/q, the round-2 40 img/s
bar is retired with this number, and DEVELOPMENT.md records the K-bound
floor. If `ctor`-`build` dominates instead, the construction matmul gets a
restructuring attempt (merge the Tq batch into M). Reference hot path
being matched: alonet/deformable_detr/ops/src/cuda/ms_deform_im2col_cuda.cuh.

Usage: python scripts/exp_msda_floor.py [--batch 16] [--size 640] [--smoke]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

MHZ = 940.0  # v5e clock, DEVELOPMENT.md round-4 cycle accounting


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


def staged_kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P,
                  stage):
    """The shipped _kernel with a stage switch. Mirrors
    ops/pallas/ms_deform_attn_kernel.py:_kernel exactly on stage='full'."""
    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _DENSE_MAX, _LANE, _coeff_plane, _pad_hw)

    Tq = idx_ref.shape[3]
    C = out_ref.shape[3]
    mm_dtype = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
        else jnp.float32
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None

    big = [lvl for lvl, (h, w) in enumerate(shapes) if h * w > _DENSE_MAX]
    small = [lvl for lvl, (h, w) in enumerate(shapes) if h * w <= _DENSE_MAX]
    end = starts[len(big) - 1] + _pad_hw(
        shapes[len(big) - 1][0] * shapes[len(big) - 1][1])
    Len_p = value_ref.shape[2]

    if stage == "sample":
        # fill-constant coeff (scalar load keeps it un-foldable), then the
        # real sampling matmul
        c0 = cw_ref[0, 0, 0, 0, 0].astype(mm_dtype)
        coeff = jnp.full((Tq, Len_p), 1e-4, mm_dtype) * c0
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm_dtype),
                          preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)
        return
    if stage == "reduce0":
        # the anti-DCE reductions alone, on fill planes: subtract from
        # build/ctor to isolate their real work
        c0 = cw_ref[0, 0, 0, 0, 0]
        Mtot = end // _LANE
        nJ = 4 * P * len(big)
        HaT = jnp.full((Tq, Mtot, nJ), 1e-4, jnp.float32) * c0
        LbT = jnp.full((Tq, _LANE, nJ), 1e-4, jnp.float32) * c0
        red = jnp.max(HaT, axis=1) + jnp.max(LbT, axis=1)   # (Tq, nJ)
        out_ref[0, 0, :, :] = jnp.pad(
            red, ((0, 0), (0, C - nJ)))[:, :C].astype(out_ref.dtype) \
            if nJ < C else red[:, :C].astype(out_ref.dtype)
        return

    # build / ctor / full share the real construction
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
    Mtot = end // _LANE
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)
    HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
    LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)

    if stage == "build":
        red = jnp.max(HaT, axis=1) + jnp.max(LbT, axis=1)   # (Tq, nJ)
        out_ref[0, 0, :, :] = red[:, :C].astype(out_ref.dtype)
        return

    coeff_big = jax.lax.dot_general(
        HaT.astype(mm_dtype), LbT.astype(mm_dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)
    parts = [coeff_big.reshape(Tq, end).astype(mm_dtype)]
    for lvl in small:
        H_l, W_l = shapes[lvl]
        parts.append(_coeff_plane(idx_ref[0, 0, lvl], cw_ref[0, 0, lvl],
                                  H_l * W_l, P, Tq, mm_dtype))
    coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    if stage == "ctor":
        out_ref[0, 0, :, :] = jnp.sum(
            coeff.reshape(Tq, Len_p // _LANE, _LANE),
            axis=1)[:, :C].astype(out_ref.dtype)
        return

    acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm_dtype),
                      preferred_element_type=jnp.float32, precision=prec)
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def staged_op(value, shapes, loc, w, stage, tile_q=128):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _corner_indices_weights, _level_starts, _pad_q, _pad_value_levels)

    B, Len_v, nH, C = value.shape
    Lq = loc.shape[1]
    L = len(shapes)
    P = loc.shape[4]
    starts = _level_starts(shapes)
    Tq = min(tile_q, Lq)
    loc, w, Lq_p = _pad_q(loc, w, Lq, Tq)
    value_h = _pad_value_levels(value.transpose(0, 2, 1, 3), shapes)
    Len_p = value_h.shape[2]
    idx, cw = _corner_indices_weights(shapes, loc, w)
    value_h, idx, cw = jax.lax.optimization_barrier((value_h, idx, cw))

    kernel = functools.partial(staged_kernel, shapes=shapes, starts=starts,
                               P=P, stage=stage)
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
        # staged variants keep extra planes live (anti-DCE reductions);
        # raise the scoped-vmem budget so they compile at Tq=128
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20),
    )(value_h, idx, cw)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)[:, :Lq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tile_q", type=int, default=128)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    nH, P = 8, 4
    if args.smoke:
        args.batch, args.size = 2, 256

    # sanity: the staged 'full' path must still match the CPU oracle
    shp_s = ((20, 20), (18, 18), (10, 10))
    Lv_s = sum(h * w for h, w in shp_s)
    Lq_s = 300
    v_s = jnp.asarray(rng.randn(2, Lv_s, nH, 32), jnp.float32)
    l_s = jnp.asarray(rng.rand(2, Lq_s, nH, len(shp_s), P, 2) * 1.2 - 0.1,
                      jnp.float32)
    raw = jnp.asarray(rng.randn(2, Lq_s, nH, len(shp_s) * P), jnp.float32)
    w_s = jax.nn.softmax(raw, -1).reshape(2, Lq_s, nH, len(shp_s), P)
    with jax.default_device(jax.devices("cpu")[0]):
        ref = np.asarray(ms_deform_attn_lax(v_s, shp_s, l_s, w_s))
    got = np.asarray(staged_op(v_s, shp_s, l_s, w_s, "full", 64))
    d = np.abs(ref - got).max() / np.abs(ref).max()
    print(f"staged-full parity f32: rel {d:.2e}", flush=True)
    assert d < 1e-5, d

    # encoder production dims
    lvls = tuple((args.size // s, args.size // s) for s in (8, 16, 32, 64))
    Lv = sum(h * w for h, w in lvls)
    B = args.batch
    base_C = 32
    loc = jnp.asarray(rng.rand(B, Lv, nH, len(lvls), P, 2), jnp.float32)
    raw = jnp.asarray(rng.randn(B, Lv, nH, len(lvls) * P), jnp.float32)
    w = jax.nn.softmax(raw, -1).reshape(B, Lv, nH, len(lvls), P)
    Lq_p = -(-Lv // args.tile_q) * args.tile_q
    n_q = B * nH * Lq_p
    print(f"encoder dims: B={B} levels={lvls} Len_v=Lq={Lv} "
          f"queries={n_q}", flush=True)

    results = {}
    for stage in ("reduce0", "build", "ctor", "sample", "full"):
        value = jnp.asarray(rng.randn(B, Lv, nH, base_C), jnp.bfloat16)
        f = jax.jit(lambda v, st=stage: v + staged_op(
            v, lvls, loc, w, st, args.tile_q
        ).reshape(B, Lv, nH, base_C).astype(v.dtype) * 1e-9)
        try:
            ms = timed(f, value, label=f"stage={stage}")
        except Exception as e:
            print(f"stage={stage}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)
            continue
        results[stage] = ms
        print(f"  -> {ms * 1e-3 * MHZ * 1e6 / n_q:.1f} cycles/query",
              flush=True)

    # C-scaling probe on the sampling pass: flat in C => K-bound
    for Cw in (32, 64, 128):
        value = jnp.asarray(rng.randn(B, Lv, nH, Cw), jnp.bfloat16)
        f = jax.jit(lambda v: v + staged_op(
            v, lvls, loc, w, "sample", args.tile_q
        ).reshape(B, Lv, nH, Cw).astype(v.dtype) * 1e-9)
        try:
            ms = timed(f, value, label=f"sample C={Cw}")
        except Exception as e:
            print(f"sample C={Cw}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)
            continue
        print(f"  -> {ms * 1e-3 * MHZ * 1e6 / n_q:.1f} cycles/query",
              flush=True)

    if all(k in results for k in ("reduce0", "build", "ctor", "sample",
                                  "full")):
        red = results["reduce0"]
        print("\nattribution (cycles/query, reduce-corrected):", flush=True)
        for name, ms in (("build", results["build"] - red),
                         ("ctor_matmul", results["ctor"] - results["build"]),
                         ("sample_matmul", results["sample"]),
                         ("full", results["full"])):
            print(f"  {name:14s} {ms * 1e-3 * MHZ * 1e6 / n_q:7.1f}"
                  f"   ({ms:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
