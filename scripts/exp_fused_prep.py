"""MSDA prep ablation on hardware: host-side idx/cw materialization ("xla")
vs in-kernel corner math ("fused").

Round-4 profile: the deformable batch (bs16 640px bf16) is ~93% encoder
(~91 ms/layer) while the MSDA kernel itself is 37 ms — the delta is the
prep's HBM materializations (idx+cw ~570 MB/layer + stacks + transposes).
This measures, at encoder dims with IN-GRAPH producers (the round-3 lesson:
op-level benches with device-constant locations hide the fusion cost):

  1. parity of both prep paths vs the CPU oracle
  2. op time with in-graph producer chain (mimics the model: offsets matmul)
  3. full DeformableDETR e2e with ALO_MSDA_PREP set both ways

Usage: python scripts/exp_fused_prep.py [--skip-e2e]
"""
import argparse
import time

import numpy as np


def fetch(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(fn, x0, iters=8):
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
    return max(t2 - t1, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--b", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn_lax
    from aloception_tpu.ops.pallas.ms_deform_attn_kernel import (
        ms_deform_attn_pallas)

    print(f"backend={jax.default_backend()}")
    # encoder dims at 640px: levels 80/40/20/10
    C, P = 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    L = len(shapes)
    Len_v = sum(h * w for h, w in shapes)
    Lq = Len_v  # encoder: every token queries
    B, nH = args.b, 8
    rng = np.random.RandomState(0)

    # ---- parity at production dims (small B for the CPU oracle) ----
    vs = jnp.asarray(rng.randn(2, Len_v, nH, C), jnp.float32)
    ls = jnp.asarray(rng.rand(2, 300, nH, L, P, 2), jnp.float32)
    ws = jnp.asarray(rng.rand(2, 300, nH, L, P), jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = np.asarray(ms_deform_attn_lax(vs, shapes, ls, ws))
    for prep in ("xla", "fused"):
        o = np.asarray(ms_deform_attn_pallas(vs, shapes, ls, ws, 64, False,
                                             prep))
        d = np.abs(o - ref).max()
        print(f"parity prep={prep}: {d:.6f} {'OK' if d < 1e-4 else 'FAIL'}",
              flush=True)
        assert d < 1e-4, prep

    # ---- op timing with IN-GRAPH producers (bf16 value, f32 loc/w) ----
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.bfloat16)
    base = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), jnp.float32)
    seed = jnp.asarray(rng.randn(B, Lq, nH * C), jnp.float32)
    Wp = jnp.asarray(rng.randn(nH * C, nH * L * P * 3) * 0.02, jnp.float32)

    def make(prep):
        def f(x):
            # producer chain like the model: a matmul emits offsets+weights
            o = (x @ Wp).reshape(B, Lq, nH, L, P, 3)
            loc = base + 0.01 * jnp.tanh(o[..., :2])
            w = jax.nn.softmax(o[..., 2].reshape(B, Lq, nH, L * P),
                               -1).reshape(B, Lq, nH, L, P)
            out = ms_deform_attn_pallas(value, shapes, loc, w, 64, False,
                                        prep)
            return x + out * 1e-3
        return jax.jit(f)

    for prep in ("xla", "fused"):
        dt = time_chain(make(prep), seed)
        print(f"op+producers B={B} Lq={Lq} prep={prep}: {dt:.1f} ms",
              flush=True)

    if args.skip_e2e:
        return

    # ---- full model e2e both ways ----
    from aloception_tpu.ops import ms_deform_attn as msda_mod
    from aloception_tpu.models.deformable_detr import DeformableDETR
    images = jnp.asarray(rng.randn(args.b, 640, 640, 3), jnp.float32)
    mask = jnp.zeros((args.b, 640, 640), jnp.float32)
    for prep in ("xla", "fused"):
        msda_mod.PALLAS_PREP = prep
        m = DeformableDETR(num_classes=91, with_box_refine=True,
                           msda_impl="pallas", dtype=jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(0), images[:1], mask[:1])
        f = jax.jit(lambda x: x + m.apply(params, x, mask)[
            "pred_logits"].mean().astype(x.dtype) * 1e-9)
        dt = time_chain(f, images, iters=4)
        print(f"deformable e2e bs{args.b} 640px bf16 prep={prep}: "
              f"{dt:.1f} ms = {args.b / dt * 1000:.1f} img/s", flush=True)
    msda_mod.PALLAS_PREP = None


if __name__ == "__main__":
    main()
