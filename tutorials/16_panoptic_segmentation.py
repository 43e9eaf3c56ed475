"""Tutorial 16 — panoptic segmentation: PanopticHead around a DETR, mask
losses, PQ evaluation, and inference with full-resolution masks
(the reference's alonet/detr_panoptic workflow, detr_panoptic.py:22 +
train.py:13 LitPanopticDetr).

A PanopticHead wraps ANY DETR-family detector (frozen by default — only the
head trains): it attends over the encoder memory per query, fuses backbone
features FPN-style, and emits one stride-4 mask per query. The criterion
adds DICE + focal mask losses to the detection losses; evaluation is
Panoptic Quality with instance-level segment matching.

Run: python tutorials/16_panoptic_segmentation.py      (CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from aloception_tpu.models.detr import Detr
    from aloception_tpu.models.panoptic import (DetrPanoptic,
                                                panoptic_criterion,
                                                inference_with_masks)
    from aloception_tpu.metrics import PQMetrics
    from aloception_tpu.aloscene import Mask, Labels

    # --- 1) a tiny detector + the panoptic head wrapped around it --------
    detector = Detr(num_classes=4, hidden_dim=64, num_queries=12, nheads=4,
                    num_encoder_layers=2, num_decoder_layers=2,
                    dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                    return_intermediate=True)
    model = DetrPanoptic(detector=detector, num_classes=4,
                         freeze_detector=True)

    B, H, W = 2, 96, 128
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    pad = jnp.zeros((B, H, W), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, pad)
    out = jax.jit(lambda p, i, m: model.apply(p, i, m))(params, images, pad)
    print("pred_masks:", out["pred_masks"].shape,
          "(one stride-4 mask per query)")

    # --- 2) the composite criterion: detection + DICE + focal masks ------
    gt_masks = np.zeros((B, 4, H, W), np.float32)
    gt_masks[:, 0, :48] = 1.0
    gt_masks[:, 1, 48:] = 1.0
    targets = {
        "boxes": jnp.asarray(np.tile([[0.5, 0.25, 0.9, 0.5],
                                      [0.5, 0.75, 0.9, 0.5],
                                      [0, 0, 0, 0], [0, 0, 0, 0]],
                                     (B, 1, 1)).astype(np.float32)),
        "labels": jnp.zeros((B, 4), jnp.int32),
        "valid": jnp.asarray(np.tile([True, True, False, False], (B, 1))),
        "masks": jnp.asarray(gt_masks),
    }
    loss, metrics = panoptic_criterion(out, targets)
    print("loss_total", float(loss), "— includes",
          [k for k in metrics if "DICE" in k or "focal" in k])

    # --- 3) inference: masks upsampled to the FRAME size -----------------
    preds = inference_with_masks(out, background_class=4,
                                 frame_size=(H, W))
    boxes, masks = preds[0]
    print("frame 0:", len(boxes), "kept queries, masks", masks.shape)

    # --- 4) Panoptic Quality: instance-level matching --------------------
    pq = PQMetrics()
    gt = Mask(gt_masks[0],
              labels=Labels(np.zeros(4, np.float32)))
    pq.add_sample(masks, gt)
    res = pq.pq_average(print_result=True)
    assert 0.0 <= res["pq"] <= 1.0
    print("\nFor the full pipeline on COCO-format data:\n"
          "  python -m aloception_tpu.commands.train_on_coco --model panoptic"
          " --sample\n"
          "  python -m aloception_tpu.commands.eval_on_coco  --model panoptic"
          " --sample")


if __name__ == "__main__":
    main()
