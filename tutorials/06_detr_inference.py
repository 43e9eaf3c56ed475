"""Tutorial 6 — DETR inference end to end: Frame -> batch_list -> jitted
forward -> aloscene boxes -> render (compare the reference's
tutorials/5.1-detrmod_coco_.py).

The inference contract is the reference's (alonet/detr/detr.py:315): the
model returns a dict of arrays, `inference()` turns it back into aloscene
BoundingBoxes2D + Labels with scores, and those attach to the input frame
for rendering — the type system closes the loop.

Run: python tutorials/06_detr_inference.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # demo runs anywhere
    import jax.numpy as jnp

    from aloception_tpu import aloscene
    from aloception_tpu.aloscene import Frame
    from aloception_tpu.models.detr import Detr, inference

    # a tiny DETR so the demo compiles in seconds; swap for
    # detr_r50(num_classes=91) + utils.weights.load_weights("detr-r50")
    # when you have the reference checkpoint on disk
    model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                 num_encoder_layers=2, num_decoder_layers=2,
                 dim_feedforward=128, stage_sizes=(1, 1, 1, 1))

    # 1) frames of DIFFERENT sizes, as they come from any dataset
    rng = np.random.RandomState(0)
    frames = [
        Frame(rng.uniform(0, 255, (3, 96, 128)).astype(np.float32)),
        Frame(rng.uniform(0, 255, (3, 80, 112)).astype(np.float32)),
    ]

    # 2) normalize to what the model asserts, pad into one batch + pad mask
    batch = aloscene.batch_list([f.norm_resnet() for f in frames])
    images = jnp.asarray(np.moveaxis(batch.as_numpy(), 1, -1))  # NHWC
    pad_mask = jnp.asarray(batch.mask.as_numpy()[:, 0])

    # 3) init + jit the forward
    params = model.init(jax.random.PRNGKey(0), images[:1], pad_mask[:1])
    fwd = jax.jit(lambda x, m: model.apply(params, x, m))
    outputs = jax.device_get(fwd(images, pad_mask))
    print("pred_logits", outputs["pred_logits"].shape,
          "pred_boxes", outputs["pred_boxes"].shape)

    # 4) back into the aloscene type system
    boxes_per_frame = inference(outputs, threshold=0.05, background_class=10)
    for frame, boxes in zip(frames, boxes_per_frame):
        frame.append_boxes2d(boxes)
        print(f"frame {frame.HW}: kept {boxes.shape[0]} boxes, "
              f"scores {np.round(np.asarray(boxes.labels.scores)[:3], 3)}")

    # 5) render (to file here; .render() would open a window)
    out = "/tmp/alo_tutorial06.png"
    frames[0].get_view().save(out)
    print("wrote", out)


if __name__ == "__main__":
    main()
