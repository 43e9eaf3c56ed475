"""Headline benchmark: DETR-R50 COCO inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the build target is >=3x TensorRT-A100 images/sec. We take
TRT_A100_IMG_S = 96.0 img/s as the assumed reference point (DETR-R50 fp16,
batch 8, ~1333x800-class input is ~60-100 img/s on A100 TRT; we benchmark at
640x640, the scale the reference's production exporter targets for DETR,
alonet/detr/trt_exporter.py). vs_baseline = value / TRT_A100_IMG_S.
"""

import argparse
import json
import time

import numpy as np


TRT_A100_IMG_S = 96.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default=None, help="force jax platform (cpu)")
    p.add_argument("--model", default="detr", choices=["detr", "raft"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke)")
    args = p.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp

    if args.model == "raft":
        return bench_raft(args)
    from aloception_tpu.models.detr import Detr, detr_r50

    if args.tiny:
        model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                     num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                     dtype=jnp.bfloat16)
        args.size = min(args.size, 128)
        args.batch = min(args.batch, 2)
    else:
        model = detr_r50(num_classes=91, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).randn(args.batch, args.size, args.size, 3),
        jnp.float32)
    mask = jnp.zeros((args.batch, args.size, args.size), jnp.float32)
    params = model.init(rng, images[:1], mask[:1])

    @jax.jit
    def forward(params, images, mask):
        out = model.apply(params, images, mask)
        return out["pred_logits"], out["pred_boxes"]

    @jax.jit
    def chained(params, images, mask):
        """Forward + fold a data-dependent perturbation into the next input:
        every iteration sees unique inputs and depends on the previous one,
        so no execution-level caching/overlap can fake the timing."""
        logits, boxes = forward(params, images, mask)
        images = images + logits.mean().astype(images.dtype) * 1e-6
        return logits, boxes, images

    def fetch(x):
        # NOTE: on the tunneled axon backend block_until_ready() returns
        # before device execution finishes; only a host value fetch truly
        # synchronizes. The chain makes the final scalar depend on every
        # iteration, so one fetch times the whole loop.
        return float(jnp.sum(x.astype(jnp.float32)))

    # compile + warmup
    logits, boxes, images = chained(params, images, mask)
    fetch(logits)
    for _ in range(args.warmup):
        logits, boxes, images = chained(params, images, mask)
    fetch(logits)

    t0 = time.perf_counter()
    for i in range(args.iters):
        logits, boxes, images = chained(params, images, mask)
    fetch(logits)
    fetch(images[0, 0, 0])
    dt = time.perf_counter() - t0

    img_s = args.batch * args.iters / dt
    print(json.dumps({
        "metric": f"detr_r50_inference_imgs_per_sec_bs{args.batch}_{args.size}px",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / TRT_A100_IMG_S, 3),
    }))


def bench_raft(args):
    """RAFT frame-pairs/sec (BASELINE.md: RAFT frame-pairs/sec target).
    Sintel-sized inputs (440x1024 padded /8), 12 iterations."""
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.raft import RAFT

    model = RAFT(dtype=jnp.bfloat16) if not args.tiny else RAFT(
        hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
    B = min(args.batch, 2)
    H, W = (440, 1024) if not args.tiny else (96, 128)
    iters = 12 if not args.tiny else 2
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), f1[:1], f2[:1], iters=1)

    @jax.jit
    def chained(f1, f2):
        flow = model.apply(params, f1, f2, iters=iters, only_last=True)
        f1 = f1 + (jnp.sum(flow.astype(jnp.float32)) * 1e-9).astype(f1.dtype)
        return flow, f1

    def fetch(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    flow, f1 = chained(f1, f2)
    fetch(flow)
    for _ in range(args.warmup):
        flow, f1 = chained(f1, f2)
    fetch(flow)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        flow, f1 = chained(f1, f2)
    fetch(flow)
    fetch(f1[0, 0, 0])
    dt = time.perf_counter() - t0
    pairs_s = B * args.iters / dt
    print(json.dumps({
        "metric": f"raft_flow_pairs_per_sec_bs{B}_{H}x{W}_it{iters}",
        "value": round(pairs_s, 2),
        "unit": "frame-pairs/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
