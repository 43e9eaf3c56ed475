"""Fused ResNet stage-1 kernel: hardware parity + timing (round 4).

The MFU attribution (exp_backbone_mfu.py) put layer1 at 14 ms / 13% MXU of
the 27 ms backbone — inter-conv HBM round trips. This script, on the real
chip:
  1. PARITY at production dims vs a CPU oracle (the backend has miscompiled
     fused XLA patterns before — DEVELOPMENT.md round-2; interpret mode
     does not validate the real lowering)
  2. kernel-level timing: fused stage vs the XLA bottleneck stack
  3. DETR e2e bs32 640px bf16 with fused_stage1 on/off

Decision rule: parity <1e-3 (f32) AND e2e faster => flip fused_stage1
default on in DetrR50/DeformableDETR; otherwise delete the kernel
(no-knob-limbo).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def time_chain(fn, x, iters=8):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    fetch(fn(x))

    def run(n):
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(y)
        fetch(y)
        return time.perf_counter() - t0

    run(2)
    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.pallas.fused_stage1 import (
        fused_bottleneck_stage, stage_ref, fold_stage_params)
    print(f"backend={jax.default_backend()}", flush=True)

    # ---- 1. parity at production dims (H=W=160, 64->256, bs8) ----
    rng = np.random.RandomState(0)
    Ci, Cm, Co = 64, 64, 256

    def bn(c):
        return {"scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
                "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                "mean": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
                "var": jnp.asarray(rng.rand(c) + 0.5, jnp.float32)}

    def block(j):
        cin = Ci if j == 0 else Co
        p = {"conv1": {"kernel": jnp.asarray(
                rng.randn(1, 1, cin, Cm) * 0.1, jnp.float32)}, "bn1": bn(Cm),
             "conv2": {"kernel": jnp.asarray(
                rng.randn(3, 3, Cm, Cm) * 0.1, jnp.float32)}, "bn2": bn(Cm),
             "conv3": {"kernel": jnp.asarray(
                rng.randn(1, 1, Cm, Co) * 0.1, jnp.float32)}, "bn3": bn(Co)}
        if j == 0:
            p["downsample_conv"] = {"kernel": jnp.asarray(
                rng.randn(1, 1, cin, Co) * 0.1, jnp.float32)}
            p["downsample_bn"] = bn(Co)
        return p

    fw = fold_stage_params([block(j) for j in range(3)])
    x = jnp.asarray(rng.randn(8, 160, 160, Ci) * 0.5, jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = np.asarray(stage_ref(x, fw))
    got = np.asarray(fused_bottleneck_stage(x, fw))
    d = np.abs(ref - got).max()
    print(f"parity f32 bs8 160x160: {d:.6f} (scale {np.abs(ref).max():.2f})"
          f"{'' if d < 1e-3 else '  <-- FAIL'}", flush=True)
    assert d < 1e-3
    got16 = np.asarray(fused_bottleneck_stage(
        x.astype(jnp.bfloat16), fw)).astype(np.float32)
    print(f"parity bf16: {np.abs(ref - got16).max():.4f} (informational)",
          flush=True)

    # ---- 2. stage-level timing, bf16, bs32 at stride-4 resolution ----
    Hs = args.size // 4
    xb = jnp.asarray(rng.randn(args.batch, Hs, Hs, Ci), jnp.bfloat16)
    seed_w = jnp.asarray(rng.randn(Co, Ci) * 0.05, jnp.bfloat16)
    for name, fn in (("xla_stack", stage_ref),
                     ("fused_pallas", fused_bottleneck_stage)):
        f = jax.jit(lambda a, fn=fn: (fn(a, fw).astype(jnp.bfloat16)
                                      @ seed_w))
        dt = time_chain(f, xb)
        print(f"stage bs{args.batch} {Hs}x{Hs} bf16 {name}: {dt:.2f} ms",
              flush=True)

    if args.skip_e2e:
        return

    # ---- 3. DETR e2e ----
    from aloception_tpu.models.detr import Detr
    imgs = jnp.asarray(rng.randn(args.batch, args.size, args.size, 3),
                       jnp.float32)
    for fused in (False, True):
        m = Detr(num_classes=91, dtype=jnp.bfloat16, fused_stage1=fused)
        params = m.init(jax.random.PRNGKey(0), imgs[:1])
        f = jax.jit(lambda a: a + m.apply(params, a)[
            "pred_logits"].mean().astype(a.dtype) * 1e-9)
        dt = time_chain(f, imgs, iters=6)
        print(f"detr e2e bs{args.batch} {args.size}px bf16 fused={fused}: "
              f"{dt:.1f} ms = {args.batch / dt * 1000:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
