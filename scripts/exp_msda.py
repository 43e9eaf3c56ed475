"""Round-3 MSDA kernel construction experiments.

Round-2 ablation (docs: DEVELOPMENT.md "Encoder MSDA cost breakdown") showed
the pallas forward is one-hot-CONSTRUCTION bound: building Ha/Lb via 3D
iota-compare-select costs ~75 ms (bf16, B=8, 640px encoder) while both
matmuls together are <15 ms. Hypothesis: Mosaic lowers the 3D broadcasts
poorly; the same one-hots built as 2D arrays (rows = Tq*nJ on sublanes,
digit on lanes) with a free sublane-split view back to 3D for the batched
dot should approach the op-count floor.

Variants:
  v0        — the shipped kernel (baseline)
  v2d       — 2D-constructed Ha/Lb, everything else identical
  v2d_t128  — v2d with tile_q=128
  sep       — separable row/column formulation (y via one-hot matmul,
              x via lane-expanded weights, P-presum + reducer matmul)

Usage: python scripts/exp_msda.py [--parity] [--variants v2d,sep]
"""

import argparse
import functools
import time

import numpy as np


def build_v2d(tile_q):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        _LANE, _DENSE_MAX, _pad_hw, _level_starts, _pad_value_levels,
        _pad_q, _corner_indices_weights)

    def _kernel(value_ref, idx_ref, cw_ref, gcol_ref, cwcol_ref, out_ref,
                *, shapes, starts, P, nJ):
        Tq = idx_ref.shape[3]
        mm_dtype = value_ref.dtype if value_ref.dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None

        big = [lvl for lvl, (h, w) in enumerate(shapes)
               if h * w > _DENSE_MAX]
        small = [lvl for lvl, (h, w) in enumerate(shapes)
                 if h * w <= _DENSE_MAX]
        assert big == list(range(len(big))), shapes

        parts = []
        if big:
            end = starts[len(big) - 1] + _pad_hw(
                shapes[len(big) - 1][0] * shapes[len(big) - 1][1])
            Mtot = end // _LANE
            # === the experiment: 2D construction from pre-laid columns ===
            g_c = gcol_ref[0, 0]                           # (Tq*nJ, 1)
            cw_c = cwcol_ref[0, 0]
            hi_c = g_c // _LANE
            lo_c = g_c - hi_c * _LANE
            iota_m = jax.lax.broadcasted_iota(jnp.int32, (Tq * nJ, Mtot), 1)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (Tq * nJ, _LANE), 1)
            Ha2 = jnp.where(iota_m == hi_c, cw_c, 0.0)
            Lb2 = jnp.where(iota_l == lo_c, 1.0, 0.0)
            Ha = Ha2.reshape(Tq, nJ, Mtot)
            Lb = Lb2.reshape(Tq, nJ, _LANE)
            coeff_big = jax.lax.dot_general(
                Ha.astype(mm_dtype), Lb.astype(mm_dtype),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec)                            # (Tq, Mtot, 128)
            parts.append(coeff_big.reshape(Tq, end).astype(mm_dtype))
        for lvl in small:
            H_l, W_l = shapes[lvl]
            HW = H_l * W_l
            HWp = _pad_hw(HW)
            iota = jax.lax.broadcasted_iota(jnp.int32, (Tq, HWp), 1)
            coeff = jnp.zeros((Tq, HWp), jnp.float32)
            tile_idx = idx_ref[0, 0, lvl]
            tile_cw = cw_ref[0, 0, lvl]
            for j in range(4 * P):
                coeff = coeff + jnp.where(iota == tile_idx[:, j:j + 1],
                                          tile_cw[:, j:j + 1], 0.0)
            parts.append(coeff.astype(mm_dtype))
        coeff = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
        acc = jax.lax.dot(coeff, value_ref[0, 0, :, :].astype(mm_dtype),
                          preferred_element_type=jnp.float32, precision=prec)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1, 4))
    def fwd(value, value_spatial_shapes, sampling_locations,
            attention_weights, interpret=False):
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

        # pre-laid (q, j)-flattened columns for the 2D in-kernel construction
        big = [lvl for lvl, (h, w_) in enumerate(shapes)
               if h * w_ > _DENSE_MAX]
        nJ = 4 * P * len(big)
        gcol = jnp.concatenate(
            [idx[:, :, lvl] + starts[lvl] for lvl in big],
            axis=-1).reshape(B, nH, Lq_p * nJ, 1)
        cwcol = jnp.concatenate(
            [cw[:, :, lvl] for lvl in big],
            axis=-1).reshape(B, nH, Lq_p * nJ, 1)

        kernel = functools.partial(_kernel, shapes=shapes, starts=starts,
                                   P=P, nJ=nJ)
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
                pl.BlockSpec((1, 1, Tq * nJ, 1),
                             lambda b, h, t: (b, h, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Tq * nJ, 1),
                             lambda b, h, t: (b, h, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, Tq, C),
                                   lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(value_h, idx, cw, gcol, cwcol)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fwd


def build_sep(tile_q):
    """Separable: per level, y-interp = (TqP, Hp) one-hot @ (Hp, W*C)
    value matmul; x-interp = lane-expanded weight multiply; P-presum on
    sublanes; final (Tq, sumWC) @ (sumWC, C) one-hot reducer matmul."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _prep(shapes, loc, w):
        # Vectorized over the L axis with NO per-level slicing: the tunneled
        # TPU backend miscompiles fused pad+slice patterns like
        # loc[:, :, :, lvl] (round-2 MSDA episode, DEVELOPMENT.md).
        Ws = jnp.asarray([float(w_l) for _, w_l in shapes], jnp.float32)
        Hs = jnp.asarray([float(h_l) for h_l, _ in shapes], jnp.float32)
        Wb = Ws[None, None, None, :, None]               # (1,1,1,L,1)
        Hb = Hs[None, None, None, :, None]
        x = loc[..., 0] * Wb - 0.5                       # (B, Lq, nH, L, P)
        y = loc[..., 1] * Hb - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        aw = w                                           # (B, Lq, nH, L, P)
        vy0 = (y0 >= 0) & (y0 < Hb)
        vy1 = (y0 + 1 >= 0) & (y0 + 1 < Hb)
        vx0 = (x0 >= 0) & (x0 < Wb)
        vx1 = (x0 + 1 >= 0) & (x0 + 1 < Wb)
        iy = jnp.stack(
            [jnp.clip(y0, 0, Hb - 1), jnp.clip(y0 + 1, 0, Hb - 1)],
            -1).astype(jnp.int32)                        # (B, Lq, nH, L, P, 2)
        ix = jnp.stack(
            [jnp.clip(x0, 0, Wb - 1), jnp.clip(x0 + 1, 0, Wb - 1)],
            -1).astype(jnp.int32)
        wy_ = jnp.stack([jnp.where(vy0, (1 - wy) * aw, 0.0),
                         jnp.where(vy1, wy * aw, 0.0)], -1)
        wx_ = jnp.stack([jnp.where(vx0, 1 - wx, 0.0),
                         jnp.where(vx1, wx, 0.0)], -1)

        # (B, Lq, nH, L, P, 2) -> (B, nH, L, Lq*P, 2)
        def pack(a):
            B_, Lq_, nH_, L_, P_, _ = a.shape
            return a.transpose(0, 2, 3, 1, 4, 5).reshape(
                B_, nH_, L_, Lq_ * P_, 2)
        return pack(iy), pack(ix), pack(wy_), pack(wx_)

    def _kernel(iy_ref, ix_ref, wy_ref, wx_ref, rd_ref, *refs,
                shapes, C):
        # refs: one (1, 1, Hp_l, W_l*C) ref per level, then out_ref
        v_refs = refs[:-1]
        out_ref = refs[-1]
        TqP = iy_ref.shape[3]
        mm_dtype = v_refs[0].dtype if v_refs[0].dtype == jnp.bfloat16 \
            else jnp.float32
        prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None
        zs = []
        for lvl, (H_l, W_l) in enumerate(shapes):
            Hp = v_refs[lvl].shape[2]
            WC = W_l * C
            y0 = iy_ref[0, 0, lvl, :, 0:1]               # (TqP, 1)
            y1 = iy_ref[0, 0, lvl, :, 1:2]
            wy0 = wy_ref[0, 0, lvl, :, 0:1]
            wy1 = wy_ref[0, 0, lvl, :, 1:2]
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (TqP, Hp), 1)
            A = (jnp.where(iota_h == y0, wy0, 0.0)
                 + jnp.where(iota_h == y1, wy1, 0.0))
            G = jax.lax.dot(A.astype(mm_dtype),
                            v_refs[lvl][0, 0].astype(mm_dtype),
                            preferred_element_type=jnp.float32,
                            precision=prec)              # (TqP, WC) f32
            x0 = ix_ref[0, 0, lvl, :, 0:1]
            x1 = ix_ref[0, 0, lvl, :, 1:2]
            wx0 = wx_ref[0, 0, lvl, :, 0:1]
            wx1 = wx_ref[0, 0, lvl, :, 1:2]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (TqP, WC), 1) // C
            E = (jnp.where(iota_w == x0, wx0, 0.0)
                 + jnp.where(iota_w == x1, wx1, 0.0))
            zs.append(G * E)                             # (TqP, WC) f32
        z = jnp.concatenate(zs, axis=1)                  # (TqP, sumWC)
        Tq = TqP // 4
        z4 = z.reshape(Tq, 4, z.shape[1]).sum(axis=1)    # P-presum
        acc = jax.lax.dot(z4.astype(mm_dtype),
                          rd_ref[:, :].astype(mm_dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)                # (Tq, C)
        out_ref[0, 0, :, :] = acc.astype(out_ref.dtype)

    @functools.partial(jax.jit, static_argnums=(1, 4))
    def fwd(value, value_spatial_shapes, sampling_locations,
            attention_weights, interpret=False):
        B, Len_v, nH, C = value.shape
        Lq = sampling_locations.shape[1]
        L = len(value_spatial_shapes)
        P = sampling_locations.shape[4]
        assert P == 4
        shapes = tuple((int(h), int(w)) for h, w in value_spatial_shapes)
        Tq = min(tile_q, Lq)
        pad_q = (-Lq) % Tq
        loc = sampling_locations
        w = attention_weights
        if pad_q:
            loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0),
                                (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, pad_q), (0, 0), (0, 0), (0, 0)))
        Lq_p = Lq + pad_q
        iy, ix, wy, wx = _prep(shapes, loc, w)

        # per-level value planes (B, nH, Hp, W*C)
        v_lvls = []
        s = 0
        for (H_l, W_l) in shapes:
            HW = H_l * W_l
            seg = value[:, s:s + HW].transpose(0, 2, 1, 3)  # (B,nH,HW,C)
            seg = seg.reshape(B, nH, H_l, W_l * C)
            Hp = -(-H_l // 8) * 8
            if Hp != H_l:
                seg = jnp.pad(seg, ((0, 0), (0, 0), (0, Hp - H_l), (0, 0)))
            v_lvls.append(seg)
            s += HW
        # fusion barrier: the backend miscompiles fused pad+slice+transpose
        # prep patterns (round-2 MSDA episode, DEVELOPMENT.md)
        iy, ix, wy, wx, *v_lvls = jax.lax.optimization_barrier(
            (iy, ix, wy, wx, *v_lvls))
        # reducer: (sumWC, C) one-hot
        sumWC = sum(W_l * C for _, W_l in shapes)
        cc = np.arange(sumWC) % C
        rd = jnp.asarray(
            (cc[:, None] == np.arange(C)[None, :]).astype(np.float32))

        kernel = functools.partial(_kernel, shapes=shapes, C=C)
        in_specs = [
            pl.BlockSpec((1, 1, L, Tq * P, 2), lambda b, h, t: (b, h, 0, t, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ] + [pl.BlockSpec((sumWC, C), lambda b, h, t: (0, 0),
                          memory_space=pltpu.VMEM)] + [
            pl.BlockSpec((1, 1) + v.shape[2:], lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
            for v in v_lvls
        ]
        # iy/ix/wy/wx blocked over the TqP axis
        out = pl.pallas_call(
            kernel,
            grid=(B, nH, Lq_p // Tq),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, Tq, C),
                                   lambda b, h, t: (b, h, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nH, Lq_p, C), value.dtype),
            interpret=interpret,
        )(iy, ix, wy, wx, rd, *v_lvls)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq_p, nH * C)
        return out[:, :Lq]

    return fwd


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--variants", default="v0,v2d,v2d_t128,sep")
    ap.add_argument("--dtype", default="both", choices=["f32", "bf16",
                                                        "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        ms_deform_attn_pallas)

    B, nH, C, P = 8, 8, 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    Len_v = sum(h * w for h, w in shapes)
    L = len(shapes)
    rng = np.random.RandomState(0)
    value_np = rng.randn(B, Len_v, nH, C)

    variants = {}
    if "v0" in args.variants:
        variants["v0"] = lambda v, s, l, a: ms_deform_attn_pallas(
            v, s, l, a, 64, False)
    if "v2d" in args.variants:
        variants["v2d"] = lambda v, s, l, a, f=build_v2d(64): f(v, s, l, a)
    if "v2d_t128" in args.variants:
        variants["v2d_t128"] = \
            lambda v, s, l, a, f=build_v2d(128): f(v, s, l, a)
    if "sep" in args.variants:
        variants["sep"] = lambda v, s, l, a, f=build_sep(64): f(v, s, l, a)

    if args.parity:
        # small-shape parity in interpret mode (CPU) AND compiled (TPU)
        Bs, Lqs = 2, 300
        sh = ((16, 20), (8, 10), (4, 5))
        lv = sum(h * w for h, w in sh)
        val = jnp.asarray(rng.randn(Bs, lv, nH, C), jnp.float32)
        loc = jnp.asarray(rng.rand(Bs, Lqs, nH, 3, P, 2) * 1.2 - 0.1,
                          jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(Bs, Lqs, nH, 3 * P), jnp.float32),
            -1).reshape(Bs, Lqs, nH, 3, P)
        ref = np.asarray(ms_deform_attn_lax(val, sh, loc, w))
        for name, fn in variants.items():
            if name == "v0":
                continue
            got = np.asarray(fn(val, sh, loc, w))
            d = np.abs(got - ref).max()
            print(f"parity[{name}] small-shape maxdiff {d:.2e}", flush=True)
        # production encoder dims on the device backend
        val = jnp.asarray(value_np, jnp.float32)
        Lq = Len_v
        loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32),
            -1).reshape(B, Lq, nH, L, P)
        ref = np.asarray(ms_deform_attn(val, shapes, loc, w, impl="fast"))
        for name, fn in variants.items():
            got = np.asarray(fn(val, shapes, loc, w))
            d = np.abs(got - ref).max()
            print(f"parity[{name}] encoder-shape maxdiff {d:.2e}",
                  flush=True)
        return

    for dt_name in (["f32", "bf16"] if args.dtype == "both"
                    else [args.dtype]):
        dtype = jnp.float32 if dt_name == "f32" else jnp.bfloat16
        value = jnp.asarray(value_np, dtype)
        for site, Lq in (("encoder", Len_v), ("decoder", 300)):
            loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), dtype)
            w = jax.nn.softmax(
                jnp.asarray(rng.randn(B, Lq, nH, L * P), dtype)
                .astype(jnp.float32), -1).reshape(B, Lq, nH, L, P) \
                .astype(dtype)
            for name, impl in variants.items():
                fn = jax.jit(lambda v, i=impl, l=loc, a=w: (
                    i(v, shapes, l, a)
                    .sum(axis=(1, 2))[:, None, None, None] * 1e-9
                    + v))
                try:
                    timed(fn, value, label=f"{dt_name} {site} {name}")
                except Exception as e:
                    print(f"{dt_name} {site} {name} FAILED: "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
