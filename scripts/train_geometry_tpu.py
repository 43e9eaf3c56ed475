"""Reference-geometry (multi-scale) DETR training on TPU, recorded.

The reference trains DETR with shorter-side scales 480-800 / max 1333
(alonet/detr/data_modules/data2detr.py:153). Dynamic shapes would recompile
XLA per unique size, so CocoDetection2Detr pads every multi-scale batch to
one of 6 canonical buckets (train/data_modules.py MULTISCALE_BUCKETS); the
jitted train step then compiles at most twice per bucket (landscape +
portrait orientation).

This script runs that pipeline for real on the chip and records:
  - distinct compiled shapes (asserted <= 12 = 2 per bucket)
  - streamed steps/s per bucket (per-step dispatch, includes host pipeline)
  - steady-state steps/s per bucket (scan-block of --block-steps on-device
    steps, the honest device-throughput number; see DEVELOPMENT.md timing
    notes: only a host value fetch synchronizes the tunnel)

Usage: python scripts/train_geometry_tpu.py --batches 40
       python scripts/train_geometry_tpu.py --cpu --tiny   (smoke)
"""

import argparse
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=40,
                   help="streamed multi-scale train batches")
    p.add_argument("--batch-size", type=int, default=2,
                   help="reference per-GPU batch size (data2detr.py:52)")
    p.add_argument("--block-steps", type=int, default=10,
                   help="scan-block length for steady-state throughput")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-compiles", type=int, default=12)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + reduced scales for CPU smoke")
    p.add_argument("--skip-block", action="store_true",
                   help="skip the steady-state scan-block phase (CPU smoke: "
                        "compiling the scanned train step takes >10 min on "
                        "the host; the streamed phase already validates the "
                        "multi-scale contract)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.models.detr import Detr, detr_r50
    from aloception_tpu.train.data_modules import CocoDetection2Detr
    from aloception_tpu.train.state import make_train_state, make_optimizer
    from aloception_tpu.train.step import make_detr_train_step

    if args.tiny:
        args.batches = min(args.batches, 8)
        args.block_steps = min(args.block_steps, 3)

    dm = CocoDetection2Detr(batch_size=args.batch_size, sample=True,
                            size=None,  # <- the reference multi-scale path
                            scales=None if not args.tiny else [480, 544, 608],
                            max_targets=100 if not args.tiny else 16)
    n_cls = len(dm.label_names or []) or 91
    if args.tiny:
        model = Detr(num_classes=n_cls, hidden_dim=64, num_queries=20,
                     nheads=4, num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=256, stage_sizes=(1, 1, 1, 1),
                     dropout=0.0)
    else:
        model = detr_r50(num_classes=n_cls)

    # init at the smallest bucket; params are shape-independent
    init_b = None
    loader = dm.train_dataloader()
    frames = next(iter(loader))
    init_b = dm.prepare_batch(frames)
    images, mask = init_b["inputs"]
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])
    tx = make_optimizer(lr=args.lr, lr_backbone=args.lr, weight_decay=1e-4,
                        grad_clip=0.1)
    state = make_train_state(model, params, tx=tx,
                             rng=jax.random.PRNGKey(1))

    # donate=False: the streamed state must survive shape-miss retraces
    step = make_detr_train_step(model, donate=False)

    per_shape_t = defaultdict(list)   # shape -> [per-step wall times]
    per_shape_first = {}
    seen = []
    n = 0
    t_start = time.time()
    it = iter(loader)
    while n < args.batches:
        try:
            frames = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        b = dm.prepare_batch(frames)
        images, mask = (jnp.asarray(x) for x in b["inputs"])
        targets = jax.tree.map(jnp.asarray, b["targets"])
        shape = tuple(images.shape[1:3])
        t0 = time.time()
        state, metrics = step(state, images, mask, targets)
        loss = float(metrics["loss_total"])   # host fetch = tunnel sync
        dt = time.time() - t0
        if shape not in per_shape_first:
            per_shape_first[shape] = dt      # includes compile
            seen.append(shape)
        else:
            per_shape_t[shape].append(dt)
        n += 1
        if n % 10 == 0:
            print(f"[stream] {n}/{args.batches} batches, "
                  f"{len(seen)} shapes, loss {loss:.3f}", flush=True)

    n_compiles = step._cache_size()
    wall = time.time() - t_start
    print(f"\n[geometry] {args.batches} streamed multi-scale batches "
          f"(bs{args.batch_size}) in {wall:.1f}s; {len(seen)} distinct "
          f"padded shapes; {n_compiles} jit cache entries "
          f"(bound {args.max_compiles})", flush=True)
    for s in sorted(seen):
        ts = per_shape_t.get(s, [])
        warm = (f"{1.0 / (sum(ts) / len(ts)):5.2f} steps/s over {len(ts)}"
                if ts else "  (hit once)")
        print(f"  {s[0]:4d}x{s[1]:4d}: first (compile) "
              f"{per_shape_first[s]:6.1f}s, warm {warm}", flush=True)
    assert n_compiles <= args.max_compiles, \
        f"{n_compiles} compiles > {args.max_compiles} bound"

    if args.skip_block:
        print("[geometry] PASS (streamed phase only; --skip-block)",
              flush=True)
        return

    # steady-state device throughput per bucket: K chained steps in ONE
    # dispatch (repeats the same batch; measures the train step, not the
    # host pipeline). jit=False returns the SAME step body the streamed
    # phase jitted — no re-implementation to drift.
    _raw_step = make_detr_train_step(model, donate=False, jit=False)

    @jax.jit
    def run_block(state, images, mask, targets):
        def body(st, _):
            st, m = _raw_step(st, images, mask, targets)
            return st, m["loss_total"]
        return jax.lax.scan(body, state, jnp.arange(args.block_steps))

    print("\n[geometry] steady-state scan-block throughput per shape:",
          flush=True)
    # tiny/CPU smoke: one shape is enough (each scan-block compile costs
    # minutes on CPU; the TPU run does all of them)
    want_shapes = 1 if args.tiny else len(seen)
    rep = {}
    it = iter(loader)
    scanned = 0
    while len(rep) < want_shapes and scanned < 100:
        try:
            frames = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        scanned += 1
        b = dm.prepare_batch(frames)
        shape = tuple(b["inputs"][0].shape[1:3])
        if shape not in rep:
            rep[shape] = b
    buckets = {}
    for s in sorted(rep):
        b = rep[s]
        images, mask = (jnp.asarray(x) for x in b["inputs"])
        targets = jax.tree.map(jnp.asarray, b["targets"])
        st2, losses = run_block(state, images, mask, targets)
        float(losses[-1])                              # warm + sync
        t0 = time.time()
        st2, losses = run_block(state, images, mask, targets)
        float(losses[-1])
        dt = (time.time() - t0) / args.block_steps
        buckets[f"{s[0]}x{s[1]}"] = round(1.0 / dt, 3)
        print(f"  {s[0]:4d}x{s[1]:4d}: {1.0 / dt:5.2f} steps/s "
              f"({dt * 1000:6.1f} ms/step, bs{args.batch_size} fp32)",
              flush=True)
    # machine-readable record: bench.py echoes this into every BENCH
    # round record so multi-scale training perf is diffable round-over-round
    # (VERDICT r4 #5)
    if not args.tiny:
        rec = {"recorded": time.strftime("%Y-%m-%d %H:%M"),
               "unit": "train steps/sec/chip",
               "config": f"detr multiscale bs{args.batch_size} fp32 "
                         f"scan-block {args.block_steps}",
               "buckets": buckets}
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "docs", "geometry_demo.json")
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[geometry] record -> {os.path.normpath(out_path)}",
              flush=True)
    print("[geometry] PASS", flush=True)


if __name__ == "__main__":
    main()
