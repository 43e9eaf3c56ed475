"""Export a model to a deployable StableHLO artifact
(reference: alonet/detr/trt_exporter.py __main__ usage).

Example:
    python -m aloception_tpu.commands.export_model --model detr --tiny \
        --out /tmp/detr.hlo --precision bf16 --profile
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--model", default="detr",
                   choices=["detr", "deformable", "raft"])
    p.add_argument("--out", required=True)
    p.add_argument("--precision", default="fp32",
                   choices=["fp32", "bf16", "fp16"])
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--num_classes", type=int, default=91)
    p.add_argument("--iters", type=int, default=12, help="raft iterations")
    p.add_argument("--no_sanity", action="store_true")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from aloception_tpu.export import (DetrExporter, DeformableDetrExporter,
                                       RAFTExporter)

    tiny = dict(hidden_dim=64, num_queries=16, nheads=4,
                num_encoder_layers=1, num_decoder_layers=1,
                dim_feedforward=64, stage_sizes=(1, 1, 1, 1))
    h, w = args.size
    if args.model == "detr":
        from aloception_tpu.models.detr import Detr, detr_r50
        model = Detr(num_classes=args.num_classes, **tiny) if args.tiny \
            else detr_r50(num_classes=args.num_classes)
        exporter_cls = DetrExporter
        example = (jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w)))
    elif args.model == "deformable":
        from aloception_tpu.models.deformable_detr import (
            DeformableDETR, deformable_detr_r50)
        model = DeformableDETR(num_classes=args.num_classes,
                               num_feature_levels=4, with_box_refine=True,
                               **tiny) if args.tiny \
            else deformable_detr_r50(num_classes=args.num_classes,
                                     with_box_refine=True)
        exporter_cls = DeformableDetrExporter
        example = (jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w)))
    else:
        from aloception_tpu.models.raft import RAFT
        model = RAFT(hidden_dim=32, context_dim=32, corr_levels=2,
                     corr_radius=2) if args.tiny else RAFT()
        exporter_cls = RAFTExporter
        example = (jnp.zeros((1, h, w, 3)),) * 2

    params = model.init(jax.random.PRNGKey(0), *example)
    if args.ckpt_dir:
        from aloception_tpu.train import CheckpointManager
        from aloception_tpu.train.state import make_train_state
        ckpt = CheckpointManager(args.ckpt_dir)
        params = ckpt.restore(make_train_state(model, params),
                              best=args.best).params
        print(f"[export] restored "
              f"{'best' if args.best else 'last'} checkpoint")

    kwargs = dict(precision=args.precision, batch_size=args.batch_size)
    if args.model == "raft":
        exporter = exporter_cls(model, params, input_shape=(h, w),
                                iters=args.iters, **kwargs)
    else:
        exporter = exporter_cls(model, params, input_shape=(h, w), **kwargs)
    artifact = exporter.export_engine(path=args.out,
                                      sanity_check=not args.no_sanity)
    print(f"[export] wrote {args.out} "
          f"({len(artifact.serialized) // 1024} KB, {args.precision})")
    if args.profile:
        print("[export] profile:", exporter.profile(n_iters=5))


if __name__ == "__main__":
    main()
