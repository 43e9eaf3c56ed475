"""Train DETR or Deformable-DETR on COCO
(reference: alonet/detr/train_on_coco.py, deformable_detr/train_on_coco.py).

Examples
--------
python -m aloception_tpu.commands.train_on_coco --sample --fast_dev_run
python -m aloception_tpu.commands.train_on_coco --model deformable \
    --batch_size 8 --max_epochs 50 --log tensorboard
"""

from __future__ import annotations

import argparse


def add_argparse_args(p: argparse.ArgumentParser):
    """(shared flags, pl_helpers.py:41-130 + detr/train.py:61)"""
    p.add_argument("--model", default="detr",
                   choices=["detr", "deformable", "panoptic",
                            "panoptic_deformable"])
    p.add_argument("--sample", action="store_true",
                   help="use offline synthetic COCO sample fixtures")
    p.add_argument("--train_on_val", action="store_true")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--max_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--fast_dev_run", action="store_true",
                   help="2 train batches + 1 val batch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--multiscale", action="store_true",
                   help="reference multi-scale geometry (scales 480-800, "
                        "max 1333, bucketed padding) instead of --size")
    p.add_argument("--project", default=None)
    p.add_argument("--expe_name", default="coco")
    p.add_argument("--run_id", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--log", default=None, choices=[None, "tensorboard", "tb"])
    p.add_argument("--log_dir", default=None,
                   help="experiment root (default ~/.aloception_tpu/"
                        "experiments via the alonet config)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1: run K batches as one jitted scan block per "
                        "dispatch (one host metric fetch per block; see "
                        "docs/training.md)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel axis size")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--multihost", action="store_true",
                   help="initialize multi-host JAX before building the mesh "
                        "(jax.distributed.initialize from "
                        "ALO_COORDINATOR_ADDRESS / ALO_NUM_PROCESSES / "
                        "ALO_PROCESS_ID, or TPU-pod auto-detect; the DDP "
                        "bring-up analog, pl_helpers.py:365-374)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model for smoke runs")
    return p


def main(argv=None):
    args = add_argparse_args(argparse.ArgumentParser(__doc__)).parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        from aloception_tpu.parallel import init_multihost
        init_multihost()
    import jax.numpy as jnp
    from aloception_tpu.train import (
        CocoDetection2Detr, make_detr_trainer, make_deformable_detr_trainer,
        make_panoptic_trainer, MetricsCallback, ApMetricsCallback,
        PQMetricsCallback)

    dm = CocoDetection2Detr(batch_size=args.batch_size,
                            num_workers=args.num_workers,
                            train_on_val=args.train_on_val,
                            sample=args.sample,
                            return_masks=args.model.startswith("panoptic"),
                            size=None if args.multiscale else tuple(args.size))
    kwargs = dict(
        data_module=dm, run_id=args.run_id, expe_name=args.expe_name,
        log=args.log, tp=args.tp,
        steps_per_dispatch=args.steps_per_dispatch,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        callbacks=[MetricsCallback(),
                   PQMetricsCallback() if args.model.startswith("panoptic")
                   else ApMetricsCallback()])
    if args.project:
        kwargs["project"] = args.project
    if args.log_dir:
        kwargs["log_dir"] = args.log_dir
    if args.lr:
        kwargs["lr"] = args.lr
    if args.fast_dev_run:
        kwargs["limit_train_batches"] = 2
        kwargs["limit_val_batches"] = 1
        args.max_epochs = 1

    n_cls = len(dm.label_names) if dm.label_names else 91
    if args.tiny:
        if args.model == "detr":
            from aloception_tpu.models.detr import Detr
            kwargs["model"] = Detr(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1))
        elif args.model == "deformable":
            from aloception_tpu.models.deformable_detr import DeformableDETR
            kwargs["model"] = DeformableDETR(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                with_box_refine=True)
        elif args.model == "panoptic":
            from aloception_tpu.models.detr import Detr
            kwargs["detector"] = Detr(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                return_intermediate=True)
        else:  # panoptic_deformable
            from aloception_tpu.models.deformable_detr import DeformableDETR
            kwargs["detector"] = DeformableDETR(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                with_box_refine=False, return_intermediate=True)
    if args.model.startswith("panoptic"):
        # LitPanopticDetr trains only the head on a frozen detector
        # (reference alonet/detr_panoptic/train.py:13); the deformable
        # variant mirrors alonet/deformable_detr_panoptic/train.py:13
        # (focal base criterion + focal matcher for the mask matching)
        kwargs.pop("model", None)
        if args.model == "panoptic_deformable":
            from functools import partial
            from aloception_tpu.models.panoptic import panoptic_criterion
            from aloception_tpu.models.deformable_detr.criterion import (
                deformable_criterion, focal_hungarian_match)
            from aloception_tpu.models.deformable_detr import (
                deformable_detr_r50)
            kwargs["criterion"] = partial(
                panoptic_criterion, base_criterion=deformable_criterion,
                matcher=focal_hungarian_match)
            if "detector" not in kwargs:
                kwargs["detector"] = deformable_detr_r50(
                    num_classes=n_cls, return_intermediate=True)
        make = make_panoptic_trainer
    else:
        make = make_detr_trainer if args.model == "detr" \
            else make_deformable_detr_trainer
    trainer = make(**kwargs)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(),
                max_epochs=args.max_epochs, max_steps=args.max_steps,
                resume=args.resume)
    print(f"[train_on_coco] done: step={trainer.global_step} "
          f"val={trainer.last_val_metrics} ckpt={trainer.ckpt_dir}")


if __name__ == "__main__":
    main()
