"""Round-4 MSDA query-tile ablation: is Tq=64 leaving MXU utilization
on the table?

The shipped kernel pins tile_q=64 (ops/ms_deform_attn.py) from a round-2
OOM note that PREDATES the transposed construction. Per-program shapes at
Tq=64: batched dot (Mtot=67, nJ=48) @ (nJ, 128) batch 64, main matmul
(64, Len_p) @ (Len_p, 32) — M=64 is half an MXU tile, so every pass runs
at <=50% row occupancy. Doubling/quadrupling Tq doubles/quadruples M at
the same total FLOPs (and shrinks the grid), at the cost of VMEM for the
coefficient planes. This script, on the real chip:
  1. parity per Tq (f32, small dims, vs ms_deform_attn_lax)
  2. op-level timing at encoder production dims (B=16, 640px levels,
     bf16), Tq in {64, 128, 256}, retrying with a raised scoped-VMEM
     limit when the default budget OOMs
Decision: flip the default tile_q in ops/ms_deform_attn.py to the winner.

Usage: python scripts/exp_msda_tq.py [--batch 16] [--size 640]
"""

import argparse
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


def softmax_w(rng, B, Lq, nH, L, P):
    import jax
    import jax.numpy as jnp
    raw = jnp.asarray(rng.randn(B, Lq, nH, L * P), jnp.float32)
    return jax.nn.softmax(raw, axis=-1).reshape(B, Lq, nH, L, P)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--tqs", type=int, nargs="+", default=[64, 128, 256])
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

    # ---- 1. parity per Tq (f32, small) ----
    rng = np.random.RandomState(0)
    nH, C, P = 8, 32, 4
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
    for tq in args.tqs:
        got = np.asarray(ms_deform_attn_pallas(value, shp_s, loc, w, tq,
                                               interp))
        d = np.abs(ref - got).max() / sc
        print(f"parity f32 Tq={tq}: rel {d:.2e}"
              f"{'' if d < 1e-5 else '  <-- FAIL'}", flush=True)
        assert d < 1e-5, tq

    # ---- 2. encoder-dims timing (bf16) ----
    lvls = tuple((args.size // s, args.size // s) for s in (8, 16, 32, 64))
    Lv = sum(h * w for h, w in lvls)
    B = args.batch
    value = jnp.asarray(rng.randn(B, Lv, nH, C), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Lv, nH, len(lvls), P, 2), jnp.float32)
    w = softmax_w(rng, B, Lv, nH, len(lvls), P)
    print(f"encoder dims: B={B} levels={lvls} Len_v=Lq={Lv}", flush=True)

    for tq in args.tqs:
        for vmem in (None, 100 * 2**20):
            tag = f"Tq={tq}" + ("" if vmem is None else " vmem=100M")
            try:
                f = jax.jit(lambda v, tq=tq, vmem=vmem: v + ms_deform_attn_pallas(
                    v, lvls, loc, w, tq, interp, vmem
                ).reshape(B, Lv, nH, C).astype(v.dtype) * 1e-9)
                timed(f, value, label=f"encoder op {tag}")
                break                       # default budget worked
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"encoder op {tag}: FAILED ({msg})", flush=True)


if __name__ == "__main__":
    main()
