"""TPU ablation: where does the Deformable-DETR batch time go?

Times the full model at bench shapes (bs16 640px bf16) while varying
num_encoder_layers / num_decoder_layers / MSDA impl — layer-count deltas
give per-component cost without tracing. Chained-timing methodology
(DEVELOPMENT.md: only host fetches synchronize through the tunnel).
"""

import argparse
import time

import numpy as np


def timed(fn, x0, iters=6, label=""):
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
    print(f"{label}: {dt * 1000:.1f} ms/batch", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.models.deformable_detr import DeformableDETR

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(args.batch, args.size, args.size, 3),
                         jnp.float32)
    mask = jnp.zeros((args.batch, args.size, args.size), jnp.float32)

    def build(enc, dec, impl):
        m = DeformableDETR(num_classes=91, with_box_refine=dec == 6,
                           num_encoder_layers=enc, num_decoder_layers=dec,
                           msda_impl=impl, dtype=jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(0), images[:1], mask[:1])
        return jax.jit(lambda x: x + m.apply(params, x, mask)[
            "pred_logits"].mean().astype(x.dtype) * 1e-9)

    # backbone-only floor: the layer-count deltas below bound the encoder/
    # decoder; this pins the remainder (R50 + multi-scale projections)
    from aloception_tpu.models.backbone.resnet import Backbone

    def build_backbone():
        bb = Backbone(return_layers=("layer2", "layer3", "layer4"),
                      dtype=jnp.bfloat16)
        params = bb.init(jax.random.PRNGKey(0), images[:1], mask[:1])
        return jax.jit(lambda x: x + bb.apply(params, x, mask)[-1][0]
                       .mean().astype(x.dtype) * 1e-9)

    try:
        timed(build_backbone(), images, label="backbone-only (C3-C5)")
    except Exception as e:
        print(f"backbone-only FAILED: {type(e).__name__}: {e}", flush=True)

    for enc, dec, impl in ((6, 6, "pallas"), (3, 6, "pallas"), (6, 3, "pallas"),
                           (6, 6, "block"), (1, 1, "pallas"), (0, 1, "pallas")):
        try:
            timed(build(enc, dec, impl), images,
                  label=f"enc={enc} dec={dec} impl={impl}")
        except Exception as e:
            print(f"enc={enc} dec={dec} impl={impl} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
