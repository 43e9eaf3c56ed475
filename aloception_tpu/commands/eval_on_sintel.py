"""Evaluate RAFT EPE on Sintel (reference: alonet/raft/eval_on_sintel.py —
reproduces the README 'EPE=1.46' table with trained weights).

Example: python -m aloception_tpu.commands.eval_on_sintel --sample --tiny --cpu
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--sample", action="store_true")
    p.add_argument("--small", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--weights", default=None,
                   help="published-weight name (raft-things, raft-chairs, "
                        "raft-sintel, raft-kitti, raft-small — see "
                        "WEIGHTS.md) or a direct .pth path; converted "
                        "torch->flax on the fly (reference: "
                        "alonet/common/weights.py:34 load_weights)")
    p.add_argument("--best", action="store_true")
    p.add_argument("--limit_samples", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import jax.numpy as jnp
    from aloception_tpu.alodataset import SintelFlowDataset, Split
    from aloception_tpu.models.raft import RAFT, raft_small, Padder

    if args.tiny:
        model = RAFT(hidden_dim=32, context_dim=32, corr_levels=2,
                     corr_radius=2)
    else:
        model = raft_small() if args.small else RAFT()

    ds = SintelFlowDataset(sample=args.sample, split=Split.TRAIN,
                           sequence_size=2)
    params = None
    apply = jax.jit(lambda p, a, b: model.apply(p, a, b, iters=args.iters,
                                                only_last=True))
    epes = []
    for i, frames in enumerate(ds.stream_loader(num_workers=2)):
        if args.limit_samples and i >= args.limit_samples:
            break
        frames = frames.norm_minmax_sym()
        f1 = np.asarray(frames[0].as_layout(("H", "W", "C")))[None]
        f2 = np.asarray(frames[1].as_layout(("H", "W", "C")))[None]
        flow_slot = frames[0].get_child("flow")
        if isinstance(flow_slot, dict):
            flow_slot = next(iter(flow_slot.values()))
        if flow_slot is None:
            continue
        gt = np.moveaxis(np.asarray(flow_slot.as_numpy()), 0, -1)

        padder = Padder(f1.shape)
        f1p, f2p = padder.pad(jnp.asarray(f1), jnp.asarray(f2))
        if params is None:
            params = model.init(jax.random.PRNGKey(0), f1p, f2p, iters=1)
            if args.weights:
                from functools import partial
                from aloception_tpu.utils.weights import (
                    convert_raft_checkpoint, load_weights)
                params = load_weights(
                    params, args.weights,
                    converter=partial(convert_raft_checkpoint,
                                      small=args.small))
                print(f"[eval] loaded published weights {args.weights}")
            elif args.ckpt_dir:
                # restore_tree, NOT restore(state): eval must not have to
                # reconstruct the training-time optimizer chain to read a
                # checkpoint (restore(state) with a fresh no-tx state fails
                # on the opt_state structure mismatch — caught by the
                # round-5 end-to-end eval rehearsal)
                from aloception_tpu.train import CheckpointManager
                ckpt = CheckpointManager(args.ckpt_dir)
                tree = ckpt.restore_tree(best=args.best)
                params = dict(tree["params"])
                if tree.get("batch_stats") is not None:
                    params["batch_stats"] = tree["batch_stats"]
                print(f"[eval] restored step "
                      f"{ckpt.best_step() if args.best else ckpt.last_step()}")
        flow = np.asarray(padder.unpad(apply(params, f1p, f2p)))[0]
        epe = float(np.sqrt(((flow - gt) ** 2).sum(-1)).mean())
        epes.append(epe)

    mean_epe = float(np.mean(epes)) if epes else float("nan")
    print(f"[eval_on_sintel] EPE={mean_epe:.3f} over {len(epes)} pairs")
    return mean_epe


if __name__ == "__main__":
    main()
