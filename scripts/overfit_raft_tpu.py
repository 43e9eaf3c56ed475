"""Overfit demo: prove the RAFT training loop LEARNS optical flow on TPU.

The DETR analog (scripts/overfit_tpu.py, AP 0.902 log) demonstrated the
detection harness; this is the flow-side counterpart mirroring the
reference's FlyingChairs recipe (alonet/raft/train.py:73): AdamW +
OneCycleLR (pct_start 0.05, linear anneal), sequence loss gamma 0.8,
grad-clip 1.0 — trained here on a small synthetic flow set until EPE is
subpixel.

Data: analytic band-limited textures f(x) = sum_k a_k sin(w_k . x + phi_k)
warped by a random affine map per pair. frame1(p) = f(p),
frame2(q) = f(Aq + b); content f(p) appears in frame2 at q = A^-1 (p - b),
so the ground-truth flow  u(p) = A^-1 (p - b) - p  is EXACT (no resampling
error), with |u| kept within ~8 px so 12 refinement iterations suffice.

Trains fp32 (same bf16 symmetry-collapse caveat as DETR — see
DEVELOPMENT.md); scan-block dispatch amortizes the tunnel latency.

Usage: python scripts/overfit_raft_tpu.py --steps 600 --eval-every 50
Writes a step/loss/EPE log to stdout (captured into DEVELOPMENT.md).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def make_pair(rng, H, W, n_waves=24, max_shift=6.0):
    """One (frame1, frame2, flow_gt) triple from an analytic texture."""
    # affine: small rotation/scale + translation
    ang = rng.uniform(-0.02, 0.02)
    sc = rng.uniform(0.985, 1.015)
    A = sc * np.array([[np.cos(ang), -np.sin(ang)],
                       [np.sin(ang), np.cos(ang)]], np.float64)
    # center the rotation/scale so the flow stays small across the frame
    c = np.array([W / 2, H / 2])
    b = c - A @ c + rng.uniform(-max_shift, max_shift, 2)

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    P = np.stack([xs, ys], -1)                     # (H, W, 2) in (x, y)

    def texture(pts):
        img = np.zeros(pts.shape[:-1] + (3,), np.float64)
        r = np.random.RandomState(12345)           # shared texture bank
        for ch in range(3):
            for _ in range(n_waves):
                w = r.uniform(0.03, 0.55, 2)       # band-limited (> 2px λ)
                phi = r.uniform(0, 2 * np.pi)
                amp = r.uniform(0.3, 1.0)
                img[..., ch] += amp * np.sin(pts[..., 0] * w[0]
                                             + pts[..., 1] * w[1] + phi)
        return img

    f1 = texture(P)
    f2 = texture(P @ A.T + b)
    Ainv = np.linalg.inv(A)
    Q = (P - b) @ Ainv.T
    flow = (Q - P).astype(np.float32)              # (H, W, 2), (dx, dy)

    def norm(img):  # minmax_sym: map to [-1, 1]
        lo, hi = img.min(), img.max()
        return (2 * (img - lo) / (hi - lo) - 1).astype(np.float32)

    return norm(f1), norm(f2), flow


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--block-steps", type=int, default=25)
    p.add_argument("--n-pairs", type=int, default=16)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--small", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-smoke config: tiny shapes, few steps")
    p.add_argument("--target-epe", type=float, default=1.0)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from aloception_tpu.models.raft import RAFT, raft_small
    from aloception_tpu.models.raft.criterion import raft_sequence_loss
    from aloception_tpu.train.state import (make_train_state, make_optimizer,
                                            onecycle_schedule)

    if args.tiny:
        args.height, args.width = 64, 96
        args.n_pairs, args.batch = 4, 2
        args.steps = min(args.steps, 50)
        args.eval_every = min(args.eval_every, 25)
        args.block_steps = min(args.block_steps, 5)
        args.iters = 4
        # 50 tiny steps reach ~1.6 px from 4.2 (CPU smoke); subpixel needs
        # the full run
        args.target_epe = max(args.target_epe, 2.5)

    H, W = args.height, args.width
    rng = np.random.RandomState(0)
    f1s, f2s, flows = zip(*[make_pair(rng, H, W)
                            for _ in range(args.n_pairs)])
    nb = args.n_pairs // args.batch
    data = dict(
        f1=jnp.asarray(np.stack(f1s)).reshape(nb, args.batch, H, W, 3),
        f2=jnp.asarray(np.stack(f2s)).reshape(nb, args.batch, H, W, 3),
        flow=jnp.asarray(np.stack(flows)).reshape(nb, args.batch, H, W, 2))

    model = raft_small() if args.small else RAFT()
    params = model.init(jax.random.PRNGKey(0), data["f1"][0, :1],
                        data["f2"][0, :1], iters=2)

    # reference schedule: OneCycleLR over steps+100 (raft/train.py:79-86)
    tx = make_optimizer(lr=args.lr, lr_backbone=args.lr, weight_decay=1e-4,
                        grad_clip=1.0,
                        schedule=onecycle_schedule(args.lr, args.steps + 100))
    state = make_train_state(model, params, tx=tx,
                             rng=jax.random.PRNGKey(1))

    def one_step(state, f1, f2, gt):
        def loss_fn(p):
            out, mut = model.apply(
                {**p, "batch_stats": state.batch_stats},
                f1, f2, iters=args.iters, deterministic=False,
                mutable=["batch_stats"])
            loss, m = raft_sequence_loss(out, gt)
            return loss, (m, mut)
        (_, (m, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        m["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=mut["batch_stats"]), m

    @jax.jit
    def run_block(state, data, start):
        def body(st, i):
            k = (start + i) % nb
            sel = lambda x: jax.lax.dynamic_index_in_dim(x, k, 0,
                                                         keepdims=False)
            return one_step(st, sel(data["f1"]), sel(data["f2"]),
                            sel(data["flow"]))
        return jax.lax.scan(body, state, jnp.arange(args.block_steps))

    @jax.jit
    def eval_epe(state, data):
        def per_batch(_, k):
            sel = lambda x: jax.lax.dynamic_index_in_dim(x, k, 0,
                                                         keepdims=False)
            out = model.apply(state.variables(), sel(data["f1"]),
                              sel(data["f2"]), iters=args.iters,
                              only_last=True, deterministic=True)
            epe = jnp.sqrt(((out - sel(data["flow"])) ** 2).sum(-1)).mean()
            return _, epe
        _, epes = jax.lax.scan(per_batch, None, jnp.arange(nb))
        return epes.mean()

    gt_mag = float(np.sqrt((np.stack(flows) ** 2).sum(-1)).mean())
    print(f"[raft-overfit] {args.n_pairs} pairs, bs{args.batch}, {H}x{W}, "
          f"iters={args.iters}, steps={args.steps}, OneCycleLR peak "
          f"{args.lr}, mean |gt flow| = {gt_mag:.2f} px", flush=True)
    t0 = time.time()
    i = 0
    while i < args.steps:
        for _ in range(max(1, args.eval_every // args.block_steps)):
            state, mhist = run_block(state, data, jnp.asarray(i))
            i += args.block_steps
        last = jax.tree.map(lambda x: x[-1], mhist)
        epe = float(eval_epe(state, data))
        sps = i / (time.time() - t0)
        print(f"step {i:5d}  loss {float(last['loss_total']):7.3f}  "
              f"train EPE {epe:6.3f} px  gnorm {float(last['grad_norm']):8.2f}"
              f"  {sps:5.2f} steps/s", flush=True)
    ok = epe < args.target_epe
    print(f"[raft-overfit] FINAL train-set EPE={epe:.3f} px "
          f"({'PASS' if ok else 'FAIL'} vs {args.target_epe} target)",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
