"""Tutorial 9 — deployment: StableHLO export, int8 quantization with
activation calibration, and the production handler (the TPU-native
replacement for the reference's torch2trt pipeline, alonet/torch2trt/).

The export path is: jit → lower → StableHLO artifact on disk → Executor
(AOT-compiled) + sanity check vs eager. Quantization offers weights-only
int8 and histogram/percentile/entropy activation calibrators driven by a
DataBatchStreamer, mirroring the reference's TRT calibrator set.

Run: python tutorials/09_export_quantization.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from aloception_tpu.models.detr import Detr
    from aloception_tpu.export import DetrExporter, Executor
    from aloception_tpu.export.quantization import (
        DataBatchStreamer, PercentileCalibrator, quantize_weights_int8,
        quantization_error)

    model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                 num_encoder_layers=2, num_decoder_layers=2,
                 dim_feedforward=128, stage_sizes=(1, 1, 1, 1))
    H, W = 96, 128
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W)))

    # --- 1) export: StableHLO artifact + executor + sanity check ----------
    path = "/tmp/alo_tutorial09/detr.hlo"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    exporter = DetrExporter(model, params, input_shape=(H, W), batch_size=1)
    exporter.export_engine(path)
    ex = Executor(path, profiling=True)
    out = ex(jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W)))
    print("artifact:", os.path.getsize(path), "bytes |",
          {k: v.shape for k, v in out.items() if hasattr(v, "shape")})
    print("latency:", ex.profiler.report())

    # --- 2) weights-only int8 ---------------------------------------------
    quant, dequant = quantize_weights_int8(params["params"]
                                           if "params" in params else params)
    err = quantization_error(params["params"]
                             if "params" in params else params, quant, dequant)
    print(f"int8 weights-only max rel error: {err:.4f}")

    # --- 3) activation calibration over a data stream ----------------------
    rng = np.random.RandomState(0)
    stream = DataBatchStreamer(
        [ (jnp.asarray(rng.randn(1, H, W, 3), jnp.float32),
           jnp.zeros((1, H, W))) for _ in range(4) ])
    calib = PercentileCalibrator(percentile=99.9)
    scales = calib.calibrate(
        lambda xs: {"pred_logits":
                    model.apply(params, xs[0], xs[1])["pred_logits"]},
        stream)
    first = sorted(scales)[:3]
    print("calibrated activation scales (first 3):",
          {k: round(float(scales[k]), 4) for k in first})


if __name__ == "__main__":
    main()
