"""Component ablation timing for DETR-R50 on the TPU.

Times backbone / transformer / full model separately with the tunnel-safe
pattern (data-dependent python-unrolled chain inside jitted calls, one scalar
fetch at the end — NO fori_loop/scan around big models: those compile
endlessly through the tunnel). Identifies where the 640px bs32 inference
budget goes so the MFU work targets the right stage.
"""

import argparse
import time

import numpy as np


def timed(jit_fn, x0, iters=8, label=""):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    x = jit_fn(x0)
    fetch(x)  # compile + run
    x = x0
    for _ in range(2):
        x = jit_fn(x)
    fetch(x)  # warm
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = jit_fn(x)
    fetch(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1000:.2f} ms/call", flush=True)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--part", default="all",
                   choices=["all", "full", "backbone", "transformer",
                            "encoder", "stem"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.backbone.resnet import Backbone
    from aloception_tpu.models.detr import detr_r50
    from aloception_tpu.models.detr.transformer import Transformer

    B, S = args.batch, args.size
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.RandomState(0).randn(B, S, S, 3),
                         jnp.float32)
    mask = jnp.zeros((B, S, S), jnp.float32)

    model = detr_r50(num_classes=91, dtype=jnp.bfloat16)
    params = model.init(rng, images[:1], mask[:1])

    if args.part in ("all", "full"):
        @jax.jit
        def full(x):
            out = model.apply(params, x, mask)
            return x + out["pred_logits"].mean().astype(x.dtype) * 1e-6

        t = timed(full, images, label=f"full DETR bs{B} {S}px")
        print(f"imgs/s full: {B / t:.1f}", flush=True)

    if args.part in ("all", "backbone"):
        bb = Backbone(return_layers=("layer4",), space_to_depth=True,
                      dtype=jnp.bfloat16)
        bb_params = {"params": params["params"]["backbone"]}

        @jax.jit
        def bbf(x):
            f, m = bb.apply(bb_params, x, mask)[-1]
            return x + jnp.mean(f).astype(x.dtype) * 1e-6

        timed(bbf, images, label="backbone R50 (layer4 out)")

    if args.part in ("all", "transformer"):
        H = W = S // 32
        L = H * W
        tr = Transformer(hidden_dim=256, nheads=8, num_encoder_layers=6,
                         num_decoder_layers=6, dim_feedforward=2048,
                         dtype=jnp.bfloat16)
        src = jnp.asarray(np.random.RandomState(1).randn(B, L, 256),
                          jnp.float32)
        msk = jnp.zeros((B, L), jnp.float32)
        pos = jnp.asarray(np.random.RandomState(2).randn(1, L, 256),
                          jnp.float32)
        q = jnp.asarray(np.random.RandomState(3).randn(100, 256), jnp.float32)
        tr_params = {"params": params["params"]["transformer"]}

        @jax.jit
        def trf(x):
            hs = tr.apply(tr_params, x, pos, q, key_padding_mask=msk)[0]
            return x + jnp.mean(hs).astype(x.dtype) * 1e-6

        timed(trf, src, label=f"transformer 6+6 (L={L})")


if __name__ == "__main__":
    main()
