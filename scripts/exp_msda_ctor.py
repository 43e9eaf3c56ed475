"""Round-5 MSDA construction-matmul restructuring attempt (the pre-committed
follow-up to scripts/exp_msda_floor.py: ctor_matmul dominates at 56.4 c/q).

Hypotheses, each a staged-kernel variant timed at encoder production dims
(B=16, 640px levels, bf16, Tq=128) with the anti-DCE reduce measured
separately (same method as the floor script):

  ctor        shipped merged transposed construction (baseline, 56.4 c/q):
              ONE Tq-batched (Mtot~67, nJ=48) @ (nJ, 128) dot, contracting
              nJ on the LANE axis of both operands (K physically padded to
              128 lanes -> possible weight-load bound: the per-query LbT
              weight tile is 128x128 regardless of nJ).
  ctor_split  per-level transposed matmuls (3 dots of (M_l, 16) @ (16, 128),
              M_l = 50/13/4): eliminates cross-level structural zeros; a
              wash IF K already pads to 128 either way, a win only if
              Mosaic exploits the smaller K.
  ctor_nt     non-transposed construction: one-hot planes built with j on
              SUBLANES (Ha (Tq, nJ, Mtot), Lb (Tq, nJ, 128)) so the dot
              contracts a sublane dim (true K=48, no 128-lane padding).
              Round 3 measured the FULL non-transposed kernel 2.3x worse
              (build-side relayouts); this isolates whether the MATMUL half
              is cheaper, which bounds what a hybrid could ever win.
  full_split  the whole pipeline (construction + sampling) with the split
              ctor — the shippable candidate if ctor_split wins.

Decision (pre-committed): wire a variant into the shipped kernel ONLY if
full_split beats the shipped full by >10% at the kernel level AND wins the
deformable e2e A/B — the fused-prep/stage-1 lesson (DEVELOPMENT.md round 4).
Otherwise DEVELOPMENT.md closes the floor at ~56 c/q with this attempt
recorded. Reference hot path being matched:
/root/reference/alonet/deformable_detr/ops/src/cuda/ms_deform_im2col_cuda.cuh

Usage: python scripts/exp_msda_ctor.py [--batch 16] [--size 640] [--smoke]
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


def _ctor_reduce(out_ref, coeff, Len_p, C):
    """Anti-DCE sum-reduce of the coeff plane, matching the floor script."""
    import jax.numpy as jnp
    Tq = coeff.shape[0]
    out_ref[0, 0, :, :] = jnp.sum(
        coeff.reshape(Tq, Len_p // 128, 128), axis=1)[:, :C].astype(
            out_ref.dtype)


def staged_kernel(value_ref, idx_ref, cw_ref, out_ref, *, shapes, starts, P,
                  stage):
    """Stage-switched copy of ops/pallas/ms_deform_attn_kernel.py:_kernel.
    'full' mirrors the shipped kernel exactly; '*_split' replace the merged
    construction with per-level dots; '_nt' uses the sublane-j layout."""
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
    Len_p = value_ref.shape[2]

    if stage == "reduce0":
        c0 = cw_ref[0, 0, 0, 0, 0]
        coeff = jnp.full((Tq, Len_p), 1e-4, jnp.float32) * c0
        _ctor_reduce(out_ref, coeff, Len_p, C)
        return

    parts = []
    if stage in ("ctor", "full"):            # shipped merged transposed
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
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, Mtot, nJ), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)
        HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
        LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)
        coeff_big = jax.lax.dot_general(
            HaT.astype(mm_dtype), LbT.astype(mm_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        parts.append(coeff_big.reshape(Tq, end).astype(mm_dtype))
    elif stage in ("ctor_split", "full_split"):   # per-level transposed dots
        for lvl in big:
            HW = shapes[lvl][0] * shapes[lvl][1]
            M_l = _pad_hw(HW) // _LANE
            idx = idx_ref[0, 0, lvl]              # level-LOCAL flat index
            hi = idx // _LANE
            lo = idx - hi * _LANE
            cw = cw_ref[0, 0, lvl]
            nJ = hi.shape[1]
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, M_l, nJ), 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, _LANE, nJ), 1)
            HaT = jnp.where(iota_m == hi[:, None, :], cw[:, None, :], 0.0)
            LbT = jnp.where(iota_l == lo[:, None, :], 1.0, 0.0)
            cb = jax.lax.dot_general(
                HaT.astype(mm_dtype), LbT.astype(mm_dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            parts.append(cb.reshape(Tq, M_l * _LANE).astype(mm_dtype))
    elif stage == "ctor_nt":                 # sublane-j construction
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
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq, nJ, Mtot), 2)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq, nJ, _LANE), 2)
        Ha = jnp.where(iota_m == hi[:, :, None], cw[:, :, None], 0.0)
        Lb = jnp.where(iota_l == lo[:, :, None], 1.0, 0.0)
        coeff_big = jax.lax.dot_general(
            Ha.astype(mm_dtype), Lb.astype(mm_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        parts.append(coeff_big.reshape(Tq, end).astype(mm_dtype))
    else:
        raise ValueError(stage)

    for lvl in small:
        H_l, W_l = shapes[lvl]
        parts.append(_coeff_plane(idx_ref[0, 0, lvl], cw_ref[0, 0, lvl],
                                  H_l * W_l, P, Tq, mm_dtype))
    coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

    if stage.startswith("ctor") or stage == "reduce0":
        _ctor_reduce(out_ref, coeff, Len_p, C)
        return
    acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm_dtype),
                      preferred_element_type=jnp.float32, precision=prec)
    out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)


def staged_op(value, shapes, loc, w, stage, tile_q=128, interpret=False):
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
    if not interpret:
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
        interpret=interpret,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20)),
    )(value_h, idx, cw)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)[:, :Lq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tile_q", type=int, default=128)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    if args.interpret:
        # JAX_PLATFORMS env is ineffective here (sitecustomize pre-imports
        # jax on the axon plugin); force CPU so the smoke never touches the
        # TPU claim (one-job rule).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    nH, P = 8, 4
    if args.smoke:
        args.batch, args.size = 2, 256

    # parity anchors: both full pipelines vs the CPU oracle
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
    for st in ("full", "full_split"):
        got = np.asarray(staged_op(v_s, shp_s, l_s, w_s, st, 64,
                                   interpret=args.interpret))
        d = np.abs(ref - got).max() / np.abs(ref).max()
        print(f"{st} parity f32: rel {d:.2e}", flush=True)
        assert d < 1e-5, (st, d)
    if args.interpret:
        print("interpret-mode parity OK (timing skipped)", flush=True)
        return

    lvls = tuple((args.size // s, args.size // s) for s in (8, 16, 32, 64))
    Lv = sum(h * w for h, w in lvls)
    B = args.batch
    loc = jnp.asarray(rng.rand(B, Lv, nH, len(lvls), P, 2), jnp.float32)
    raw = jnp.asarray(rng.randn(B, Lv, nH, len(lvls) * P), jnp.float32)
    w = jax.nn.softmax(raw, -1).reshape(B, Lv, nH, len(lvls), P)
    Lq_p = -(-Lv // args.tile_q) * args.tile_q
    n_q = B * nH * Lq_p
    print(f"encoder dims: B={B} levels={lvls} Len_v=Lq={Lv} "
          f"queries={n_q}", flush=True)

    results = {}
    for stage in ("reduce0", "ctor", "ctor_split", "ctor_nt", "full",
                  "full_split"):
        value = jnp.asarray(rng.randn(B, Lv, nH, 32), jnp.bfloat16)
        f = jax.jit(lambda v, st=stage: v + staged_op(
            v, lvls, loc, w, st, args.tile_q
        ).reshape(B, Lv, nH, 32).astype(v.dtype) * 1e-9)
        try:
            ms = timed(f, value, label=f"stage={stage}")
        except Exception as e:
            print(f"stage={stage}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)
            continue
        results[stage] = ms
        print(f"  -> {ms * 1e-3 * MHZ * 1e6 / n_q:.1f} cycles/query",
              flush=True)

    if "reduce0" in results:
        red = results["reduce0"]
        print("\nctor variants (cycles/query, reduce-corrected):",
              flush=True)
        for name in ("ctor", "ctor_split", "ctor_nt"):
            if name in results:
                ms = results[name] - red
                print(f"  {name:11s} {ms * 1e-3 * MHZ * 1e6 / n_q:7.1f}"
                      f"   ({ms:.2f} ms)", flush=True)
        for name in ("full", "full_split"):
            if name in results:
                ms = results[name]
                print(f"  {name:11s} {ms * 1e-3 * MHZ * 1e6 / n_q:7.1f}"
                      f"   ({ms:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
