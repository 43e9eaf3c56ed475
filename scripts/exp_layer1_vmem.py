"""Round-5 DETR layer1 experiment (VERDICT r4 #8): one bounded NON-kernel
attempt at the backbone stage-1 gap before closing the story.

Round-4 attribution (scripts/exp_backbone_mfu.py): layer1 (stem + 3
bottlenecks at 160x160) runs at 13% MXU, ~14 ms of the 27 ms backbone —
the cost is ~10 intermediate 160x160x{64,256} activation tensors XLA
materializes to HBM between convs it does not fuse. Two Pallas kernels
(space-to-depth stem, fused stage-1) already LOST e2e (DEVELOPMENT.md
round 4). Hypothesis here: XLA's fusion depth on the conv pipeline is
capped by the 16 MB scoped-VMEM budget (the same limit Mosaic kernels hit,
see the compile-OOM messages); raising `xla_tpu_scoped_vmem_limit_kib`
via jit compiler_options may let it keep more of the chain in VMEM.

A/B: full DETR forward e2e (bs32 640px bf16) and the layer1-only prefix,
at scoped-VMEM 16 MB (default) / 32 / 64 / 96 MB. Decision pre-committed:
any variant must win E2E to ship (the fused-prep/stage-1 lesson); if none
does, DEVELOPMENT.md closes the layer1 story at ~1000 img/s with this as
the final bounded experiment.

Reference being matched: /root/reference/alonet/detr/backbone.py:50-203.
Usage: python scripts/exp_layer1_vmem.py [--batch 32] [--size 640]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def timed(fn, x0, iters=8):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    fetch(fn(x0))  # compile

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
    return max(t2 - t1, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.models.backbone.resnet import ResNet
    from aloception_tpu.models.detr import detr_r50

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.size, args.size, 3),
                    jnp.float32)
    mask = jnp.zeros((args.batch, args.size, args.size), jnp.float32)

    bb = ResNet(dtype=jnp.bfloat16)
    bb_params = bb.init(jax.random.PRNGKey(0), x[:1])

    detr = detr_r50(num_classes=91, dtype=jnp.bfloat16)
    detr_params = detr.init(jax.random.PRNGKey(0), x[:1], mask[:1])

    def layer1_fn(xx):
        return xx + bb.apply(bb_params, xx)["layer1"].mean().astype(
            xx.dtype) * 1e-9

    def detr_fn(xx):
        out = detr.apply(detr_params, xx, mask)
        return xx + out["pred_logits"].mean().astype(xx.dtype) * 1e-9

    for kib in (None, 32768, 65536, 98304):
        opts = None if kib is None else {
            "xla_tpu_scoped_vmem_limit_kib": str(kib)}
        label = "default-16M" if kib is None else f"{kib // 1024}M"
        for name, fn in (("layer1", layer1_fn), ("detr_e2e", detr_fn)):
            try:
                lowered = jax.jit(fn).lower(x)
                compiled = lowered.compile(compiler_options=opts) \
                    if opts else lowered.compile()
                dt = timed(compiled, x)
                extra = ""
                if name == "detr_e2e":
                    extra = f"  ({args.batch / dt:.0f} img/s)"
                print(f"vmem={label:12s} {name:9s} {dt * 1e3:7.2f} ms{extra}",
                      flush=True)
            except Exception as e:
                print(f"vmem={label:12s} {name:9s} FAILED "
                      f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
