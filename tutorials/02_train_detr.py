"""Tutorial 2 — train a (tiny) DETR on the offline COCO sample set and export
it for deployment.

Run: python tutorials/02_train_detr.py            # tiny model, sample data
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_platforms", "cpu")  # demo runs anywhere

    from aloception_tpu.models.detr import Detr, inference
    from aloception_tpu.train import (CocoDetection2Detr, make_detr_trainer,
                                      ApMetricsCallback, MetricsCallback)

    dm = CocoDetection2Detr(sample=True, size=(96, 128), batch_size=4)
    model = Detr(num_classes=len(dm.label_names), hidden_dim=64,
                 num_queries=20, nheads=4, num_encoder_layers=2,
                 num_decoder_layers=2, dim_feedforward=128,
                 stage_sizes=(1, 1, 1, 1))
    trainer = make_detr_trainer(
        model=model, data_module=dm, lr=1e-3,
        callbacks=[MetricsCallback(), ApMetricsCallback()],
        limit_val_batches=1)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=2)
    print("trained to step", trainer.global_step,
          "val:", trainer.last_val_metrics.get("val_loss_total"))

    # deployment: StableHLO artifact + executor
    from aloception_tpu.export import DetrExporter, Executor
    exporter = DetrExporter(model, trainer.state.params,
                            input_shape=(96, 128), batch_size=1)
    artifact = exporter.export_engine("/tmp/detr_tiny.hlo")
    ex = Executor("/tmp/detr_tiny.hlo", profiling=True)
    out = ex(jnp.zeros((1, 96, 128, 3)), jnp.zeros((1, 96, 128)))
    boxes = inference(jax.device_get(out),
                      background_class=len(dm.label_names))
    print("exported + executed:", out["pred_logits"].shape,
          "| first frame kept", boxes[0].shape[0], "boxes",
          "| latency:", ex.profiler.report())


if __name__ == "__main__":
    main()
