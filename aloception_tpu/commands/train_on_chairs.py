"""Train RAFT on FlyingChairs2 (reference: alonet/raft/train_on_chairs.py).

Example: python -m aloception_tpu.commands.train_on_chairs --sample --fast_dev_run
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--sample", action="store_true")
    p.add_argument("--small", action="store_true", help="RAFT-small")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--max_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--fast_dev_run", action="store_true")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--log", default=None)
    p.add_argument("--run_id", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize before the mesh (env: "
                        "ALO_COORDINATOR_ADDRESS/ALO_NUM_PROCESSES/"
                        "ALO_PROCESS_ID or TPU-pod auto-detect)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1: K batches per jitted scan block "
                        "(docs/training.md)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from aloception_tpu.parallel import init_multihost
        init_multihost()
    from aloception_tpu.train import Data2RAFT, make_raft_trainer

    dm = Data2RAFT(batch_size=args.batch_size, num_workers=args.num_workers,
                   sample=args.sample)
    # OneCycleLR over max_steps + 100 when a step budget is given, exactly
    # like the reference (alonet/raft/train.py:76-86)
    kwargs = dict(data_module=dm, small=args.small, iters=args.iters,
                  log=args.log, run_id=args.run_id, num_steps=args.max_steps,
                  steps_per_dispatch=args.steps_per_dispatch)
    if args.tiny:
        from aloception_tpu.models.raft import RAFT
        kwargs["model"] = RAFT(hidden_dim=32, context_dim=32, corr_levels=2,
                               corr_radius=2)
    if args.fast_dev_run:
        kwargs["limit_train_batches"] = 2
        kwargs["limit_val_batches"] = 1
        args.max_epochs = 1
    trainer = make_raft_trainer(**kwargs)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(),
                max_epochs=args.max_epochs, max_steps=args.max_steps,
                resume=args.resume)
    print(f"[train_on_chairs] done: step={trainer.global_step} "
          f"val={trainer.last_val_metrics} ckpt={trainer.ckpt_dir}")
    return trainer.ckpt_dir


if __name__ == "__main__":
    main()
