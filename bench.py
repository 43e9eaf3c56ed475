"""Headline benchmark: DETR-R50 / Deformable-DETR / RAFT throughput on one
TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}:
the headline metric is DETR-R50 COCO inference throughput; "extra" carries
the RAFT and Deformable-DETR numbers so every round's record is
multi-metric.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the build target is >=3x TensorRT-A100 images/sec. We take
TRT_A100_IMG_S = 96.0 img/s as the assumed reference point (DETR-R50 fp16,
batch 8, ~1333x800-class input is ~60-100 img/s on A100 TRT; we benchmark at
640x640, the scale the reference's production exporter targets for DETR,
alonet/detr/trt_exporter.py). vs_baseline = value / TRT_A100_IMG_S.

Timing methodology (tunneled TPU backend):
- block_until_ready() does NOT synchronize here; only host value fetches do.
- Each jitted call returns ONE array and the loop chains it data-dependently;
  extra returned device handles cost a tunnel round-trip per call (that
  artifact capped round-1 records at ~253 img/s for a ~880 img/s model).
- Difference timing (2N iters minus N iters) cancels the constant ~0.2 s
  fetch overhead.
"""

import argparse
import json
import time

import numpy as np


TRT_A100_IMG_S = 96.0


def _fetch(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_chain(chained, x0, iters):
    """Compile, warm, then difference-time `iters` chained calls."""
    _fetch(chained(x0))

    def run(n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = chained(x)
        _fetch(x)
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def bench_detr(args):
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.detr import Detr, detr_r50

    if args.tiny:
        model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                     num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                     dtype=jnp.bfloat16)
        size, batch = min(args.size, 128), min(args.batch, 2)
    else:
        model = detr_r50(num_classes=91, dtype=jnp.bfloat16)
        size, batch = args.size, args.batch

    images = jnp.asarray(
        np.random.RandomState(0).randn(batch, size, size, 3), jnp.float32)
    mask = jnp.zeros((batch, size, size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])

    @jax.jit
    def chained(x):
        out = model.apply(params, x, mask)
        return x + out["pred_logits"].mean().astype(x.dtype) * 1e-6

    dt = _time_chain(chained, images, args.iters)
    img_s = batch / dt
    return {
        "metric": f"detr_r50_inference_imgs_per_sec_bs{batch}_{size}px",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / TRT_A100_IMG_S, 3),
    }


def bench_deformable(args):
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.deformable_detr import deformable_detr_r50

    batch = 2 if args.tiny else min(args.batch, 16)
    size = 128 if args.tiny else args.size
    model = deformable_detr_r50(num_classes=91, with_box_refine=True,
                                dtype=jnp.bfloat16)
    images = jnp.asarray(
        np.random.RandomState(0).randn(batch, size, size, 3), jnp.float32)
    mask = jnp.zeros((batch, size, size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])

    @jax.jit
    def chained(x):
        out = model.apply(params, x, mask)
        return x + out["pred_logits"].mean().astype(x.dtype) * 1e-6

    dt = _time_chain(chained, images, max(args.iters // 2, 4))
    img_s = batch / dt
    return {
        "metric": f"deformable_detr_r50_refine_imgs_per_sec_bs{batch}_{size}px",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,  # the 96 img/s TRT point is DETR-specific
    }


def bench_raft(args):
    """RAFT frame-pairs/sec at the round-target shape 368x496, 12 iters."""
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.raft import RAFT

    model = RAFT(dtype=jnp.bfloat16) if not args.tiny else RAFT(
        hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
    B = min(args.batch, 2)
    H, W = (368, 496) if not args.tiny else (96, 128)
    iters = 12 if not args.tiny else 2
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), f1[:1], f2[:1], iters=1)

    @jax.jit
    def chained_2(x, other):
        # `other` must be an ARGUMENT: as a closure constant XLA
        # constant-folds fnet(frame2) away entirely at compile time
        flow = model.apply(variables, x, other, iters=iters, only_last=True)
        return x + (jnp.sum(flow.astype(jnp.float32)) * 1e-9).astype(x.dtype)

    def chained(x):
        return chained_2(x, f2)

    dt = _time_chain(chained, f1, max(args.iters // 2, 4))
    pairs_s = B / dt
    return {
        "metric": f"raft_flow_pairs_per_sec_bs{B}_{H}x{W}_it{iters}",
        "value": round(pairs_s, 2),
        "unit": "frame-pairs/sec/chip",
        "vs_baseline": None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default=None, help="force jax platform (cpu)")
    p.add_argument("--model", default="all",
                   choices=["all", "detr", "raft", "deformable"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke)")
    args = p.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    benches = {"detr": bench_detr, "raft": bench_raft,
               "deformable": bench_deformable}
    if args.model != "all":
        print(json.dumps(benches[args.model](args)))
        return

    extra = {}
    headline = bench_detr(args)
    for name in ("raft", "deformable"):
        try:
            r = benches[name](args)
            extra[r["metric"]] = {"value": r["value"], "unit": r["unit"]}
        except Exception as e:  # a broken secondary bench must not zero the record
            extra[name] = {"error": f"{type(e).__name__}: {e}"}
    headline["extra"] = extra
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
