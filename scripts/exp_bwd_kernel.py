"""Round-3: can the dedicated Pallas MSDA backward kernel run on hardware?

Round-2 blockers: (1) the tunneled backend miscompiled the fused epilogue —
now barriered inside ms_deform_attn_pallas_bwd; (2) a 16 MB scoped-VMEM
compile OOM — now lifted with the vmem_limit_bytes raise. This script
decides the kernel's fate (VERDICT #6): parity vs CPU lax autodiff at
production dims, then timing vs the shipped block-autodiff backward.

  PASS + faster  -> make it the pallas custom-VJP backward
  FAIL or slower -> delete the kernel (negative result to DEVELOPMENT.md)

Usage: python scripts/exp_bwd_kernel.py [--encoder] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", action="store_true",
                    help="Lq = Len_v encoder shape (default: decoder 300)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=2)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax,
                                                   ms_deform_attn_block)
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        ms_deform_attn_pallas_bwd)

    C, P = 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    L = len(shapes)
    Len_v = sum(h * w for h, w in shapes)
    B, nH = args.b, 8
    Lq = Len_v if args.encoder else 300
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)
    loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, Lq, nH, L, P), jnp.float32)
    g = jnp.asarray(rng.randn(B, Lq, nH * C), jnp.float32)

    # CPU oracle: autodiff of the lax reference
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        g_ref = jax.vjp(lambda v, l, a: ms_deform_attn_lax(
            v, shapes, l, a), value, loc, w)[1](g)

    # dedicated kernel on the default backend (interpret on cpu)
    g_ker = ms_deform_attn_pallas_bwd(value, shapes, loc, w, g,
                                      interpret=args.cpu)
    ok = True
    for name, a, b in zip(("dvalue", "dloc", "dw"), g_ref, g_ker):
        scale = max(float(jnp.abs(jnp.asarray(a)).max()), 1.0)
        d = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max()) / scale
        ok &= d <= 1e-4
        print(f"parity {name}: rel maxdiff {d:.2e}"
              f"{'' if d <= 1e-4 else '  <-- FAIL'}", flush=True)

    # timing: dedicated kernel vs block-autodiff backward (chained fetch)
    def timed(fn, label, iters=6):
        def fetch(outs):
            return float(sum(jnp.sum(o.astype(jnp.float32)) for o in outs))
        fetch(fn(value))

        def run(n):
            t0 = time.perf_counter()
            s = 0.0
            for i in range(n):
                s += fetch(fn(value + s * 1e-30))
            return time.perf_counter() - t0
        run(2)
        t1 = run(iters)
        t2 = run(2 * iters)
        dt = max(t2 - t1, 1e-9) / iters
        print(f"{label}: {dt * 1000:.2f} ms/call", flush=True)
        return dt

    kernel_fn = jax.jit(lambda v: ms_deform_attn_pallas_bwd(
        v, shapes, loc, w, g, interpret=args.cpu))
    block_fn = jax.jit(lambda v: jax.vjp(
        lambda vv, l, a: ms_deform_attn_block(vv, shapes, l, a),
        v, loc, w)[1](g))
    t_k = timed(kernel_fn, "dedicated kernel bwd")
    t_b = timed(block_fn, "block-autodiff bwd  ")
    print(f"verdict: parity {'PASS' if ok else 'FAIL'}, "
          f"kernel {'WINS' if t_k < t_b else 'loses'} "
          f"({t_k * 1000:.1f} vs {t_b * 1000:.1f} ms)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
