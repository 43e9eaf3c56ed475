"""Evaluate DETR-family models on COCO val (reference:
alonet/detr/eval_on_coco.py, deformable_detr/eval_on_coco.py).

Loads a checkpoint (best/last by monitor) and reproduces the README AP
tables via metrics.ApMetrics.

Example: python -m aloception_tpu.commands.eval_on_coco --sample --tiny --cpu
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--model", default="detr",
                   choices=["detr", "deformable", "panoptic",
                            "panoptic_deformable"])
    p.add_argument("--sample", action="store_true")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--size", type=int, nargs=2, default=(480, 640))
    p.add_argument("--ckpt_dir", default=None,
                   help="experiment dir with checkpoints; random init if none")
    p.add_argument("--run_id", default=None,
                   help="resolve the checkpoint dir from a train run's "
                        "run_id (the train CLI prints it; reference "
                        "pl_helpers.py:222 load_training)")
    p.add_argument("--project", default=None,
                   help="narrow --run_id resolution to one project")
    p.add_argument("--log_dir", default=None,
                   help="experiment root for --run_id resolution")
    p.add_argument("--best", action="store_true", help="best ckpt (else last)")
    p.add_argument("--weights", default=None,
                   help="published-weight name from the registry "
                        "(detr-r50, deformable-detr-r50[-refinement], "
                        "detr-r50-panoptic — see WEIGHTS.md) or a direct "
                        ".pth path; converted torch->flax on the fly "
                        "(reference: alonet/common/weights.py:34 "
                        "load_weights)")
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--limit_batches", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import jax.numpy as jnp
    from aloception_tpu.train import CocoDetection2Detr
    from aloception_tpu.metrics import ApMetrics, PQMetrics

    if args.run_id and not args.ckpt_dir:
        from aloception_tpu.train import find_run_dir
        args.ckpt_dir = find_run_dir(args.run_id, project=args.project,
                                     log_dir=args.log_dir)
        print(f"[eval] run_id {args.run_id} -> {args.ckpt_dir}")

    dm = CocoDetection2Detr(batch_size=args.batch_size, sample=args.sample,
                            return_masks=args.model.startswith("panoptic"),
                            size=tuple(args.size))
    n_cls = len(dm.label_names) if dm.label_names else 91

    if args.model.startswith("panoptic"):
        from aloception_tpu.models.panoptic import (DetrPanoptic,
                                                    inference_with_masks)
        if args.model == "panoptic_deformable":
            # reference: alonet/deformable_detr_panoptic/eval_on_coco.py
            from aloception_tpu.models.deformable_detr import (
                DeformableDETR, deformable_detr_r50)
            detector = DeformableDETR(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                with_box_refine=False, return_intermediate=True) \
                if args.tiny else deformable_detr_r50(
                    num_classes=n_cls, return_intermediate=True)
            act = "sigmoid"
        else:
            from aloception_tpu.models.detr import Detr
            detector = Detr(
                num_classes=n_cls, hidden_dim=64, num_queries=20, nheads=4,
                num_encoder_layers=2, num_decoder_layers=2,
                dim_feedforward=128,
                stage_sizes=(1, 1, 1, 1), return_intermediate=True) \
                if args.tiny else None
            act = "softmax"
        model = DetrPanoptic(detector=detector, num_classes=n_cls)
        num_queries = detector.num_queries if detector else 100
        inference = lambda o, fs=None: inference_with_masks(
            o, threshold=args.threshold if act == "softmax"
            else max(args.threshold, 0.2),
            background_class=n_cls, activation_fn=act, frame_size=fs)
    elif args.model == "detr":
        from aloception_tpu.models.detr import Detr, detr_r50
        from aloception_tpu.models.detr import inference as inf
        model = Detr(num_classes=n_cls, hidden_dim=64, num_queries=20,
                     nheads=4, num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=128, stage_sizes=(1, 1, 1, 1)) \
            if args.tiny else detr_r50(num_classes=n_cls)
        inference = lambda o, fs=None: inf(o, threshold=args.threshold,
                                           background_class=n_cls)
    else:
        from aloception_tpu.models.deformable_detr import (
            DeformableDETR, deformable_detr_r50)
        from aloception_tpu.models.deformable_detr import inference as inf
        # published 'deformable-detr-r50' (no suffix) is the non-refinement
        # checkpoint (reference weights.py:8-13) — match the model config
        refine = not (args.weights and "deformable" in args.weights
                      and "refinement" not in args.weights)
        model = DeformableDETR(num_classes=n_cls, hidden_dim=64,
                               num_queries=20, nheads=4,
                               num_encoder_layers=2, num_decoder_layers=2,
                               dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                               with_box_refine=refine) \
            if args.tiny else deformable_detr_r50(num_classes=n_cls,
                                                  with_box_refine=refine)
        inference = lambda o, fs=None: inf(o, threshold=max(args.threshold,
                                                            0.2))

    if not args.model.startswith("panoptic"):
        num_queries = model.num_queries
    dm.max_targets = min(dm.max_targets, num_queries)
    loader = dm.val_dataloader()
    params = None
    apply = jax.jit(lambda p, i, m: model.apply(p, i, m))
    metrics = ApMetrics()
    pq_metrics = PQMetrics() if args.model.startswith("panoptic") else None

    for i, frames_list in enumerate(loader):
        if args.limit_batches and i >= args.limit_batches:
            break
        prepared = dm.prepare_batch(frames_list, training=False)
        images, mask = prepared["inputs"]
        if params is None:
            params = model.init(jax.random.PRNGKey(0),
                                jnp.asarray(images[:1]), jnp.asarray(mask[:1]))
            if args.weights:
                # published torch .pth -> flax on the fly (reference
                # load_weights, alonet/common/weights.py:34; see WEIGHTS.md)
                from functools import partial
                from aloception_tpu.utils import weights as W
                if args.model == "detr":
                    conv = W.convert_detr_checkpoint
                elif args.model == "deformable":
                    conv = partial(W.convert_deformable_checkpoint,
                                   with_box_refine=refine)
                elif args.model == "panoptic":
                    def conv(sd):
                        c = W.convert_panoptic_checkpoint(sd)
                        return {"params": {
                            "detector": c["detr"]["params"],
                            "panoptic_head": c["head"]["params"]}}
                else:
                    raise SystemExit(
                        "--weights: the reference publishes no "
                        "deformable-panoptic checkpoint (weights.py:6-31)")
                params = W.load_weights(params, args.weights, converter=conv)
                print(f"[eval] loaded published weights {args.weights}")
            elif args.ckpt_dir:
                from aloception_tpu.train import CheckpointManager
                ckpt = CheckpointManager(args.ckpt_dir)
                tree = ckpt.restore_tree(best=args.best)
                params = dict(tree["params"])
                if tree.get("batch_stats") is not None:
                    params["batch_stats"] = tree["batch_stats"]
                print(f"[eval] restored step "
                      f"{ckpt.best_step() if args.best else ckpt.last_step()}")
        out = jax.device_get(apply(params, jnp.asarray(images),
                                   jnp.asarray(mask)))
        preds = inference(out, tuple(images.shape[1:3]))
        frames = prepared["frames"]
        gt_list = frames.boxes2d if isinstance(frames.boxes2d, list) \
            else [frames.boxes2d]
        if pq_metrics is not None:
            seg_slot = frames.get_child("segmentation")
            seg_list = seg_slot if isinstance(seg_slot, list) else [seg_slot]
            for (pb, pm), tb, seg in zip(preds, gt_list, seg_list):
                if tb is not None:
                    metrics.add_sample(pb, tb)
                if seg is not None and not isinstance(seg, dict):
                    pq_metrics.add_sample(pm, seg)
        else:
            for pb, tb in zip(preds, gt_list):
                if tb is not None:
                    metrics.add_sample(pb, tb)

    all_maps, per_class = metrics.calc_map(print_result=True)
    if pq_metrics is not None:
        # reference prints the PQ/SQ/RQ table at eval end (compute_pq.py:79)
        pq_all = pq_metrics.pq_average(isthing=None, print_result=True)
        pq_metrics.pq_average(isthing=True, print_result=True)
        pq_metrics.pq_average(isthing=False, print_result=True)
        print(f"[eval_on_coco] PQ={pq_all['pq']:.3f} SQ={pq_all['sq']:.3f} "
              f"RQ={pq_all['rq']:.3f}")
    print(f"[eval_on_coco] AP={all_maps['all']['all']:.2f} "
          f"AP50={all_maps['all'][50]:.2f}")
    return all_maps


if __name__ == "__main__":
    main()
