"""Export layer: StableHLO artifact roundtrip, executor, quantization,
serving handler (mirrors reference torch2trt sanity-check/export tests)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aloception_tpu.models.detr import Detr
from aloception_tpu.export import (
    DetrExporter, Executor, ExportArtifact, quantize_weights_int8,
    quantization_error, MinMaxCalibrator, DataBatchStreamer)
from aloception_tpu.export.production import ModelHandler


@pytest.fixture(scope="module")
def tiny_model():
    model = Detr(num_classes=4, hidden_dim=64, num_queries=10, nheads=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 dim_feedforward=64, stage_sizes=(1, 1, 1, 1), aux_loss=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 64, 96)))
    return model, params


def test_export_roundtrip_and_sanity(tiny_model, tmp_path):
    model, params = tiny_model
    exp = DetrExporter(model, params, input_shape=(64, 96), batch_size=1)
    path = str(tmp_path / "detr.stablehlo")
    artifact = exp.export_engine(path=path, sanity_check=True)
    assert os.path.exists(path) and os.path.exists(path + ".json")
    # reload from disk and execute
    ex = Executor(path, profiling=True)
    out = ex(jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 64, 96)))
    assert out["pred_logits"].shape == (1, 10, 5)
    assert out["pred_boxes"].shape == (1, 10, 4)
    rep = ex.profiler.report()
    assert rep["calls"] == 1 and rep["mean_ms"] > 0


def test_export_bf16_precision(tiny_model, tmp_path):
    model, params = tiny_model
    exp = DetrExporter(model, params, input_shape=(64, 96), precision="bf16",
                       sanity_atol=0.5)
    artifact = exp.export_engine(sanity_check=True)
    assert artifact.meta["precision"] == "bf16"


def test_export_sanity_catches_mismatch(tiny_model):
    model, params = tiny_model

    class Broken(DetrExporter):
        def sanity_check(self, artifact, inputs, eager_fn):
            # compare against a DIFFERENT function: must fail
            super().sanity_check(
                artifact, inputs,
                lambda *xs: jax.tree.map(lambda y: y + 1.0, eager_fn(*xs)))

    with pytest.raises(AssertionError):
        Broken(model, params, input_shape=(64, 96)).export_engine()


def test_weight_quantization(tiny_model):
    model, params = tiny_model
    q, dequant = quantize_weights_int8(params, min_size=256)
    err = quantization_error(params, q, dequant)
    assert err < 0.02  # per-channel absmax int8: <2% of absmax
    # dense reconstruction still runs the model
    dense = dequant(q)
    out = model.apply(dense, jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, 64, 96)))
    assert np.isfinite(np.asarray(out["pred_logits"])).all()


def test_calibrator():
    from aloception_tpu.alodataset import CocoBaseDataset
    ds = CocoBaseDataset(sample=True)
    streamer = DataBatchStreamer(ds, batch_size=2, max_batches=2)
    calib = MinMaxCalibrator()

    def fn(batch):
        imgs = np.stack([np.asarray(f.resize((64, 96)).as_numpy())
                         for f in batch])
        return {"input": jnp.asarray(imgs)}

    scales = calib.calibrate(fn, streamer)
    assert "input" in scales and scales["input"] > 0


def test_model_handler(tiny_model, tmp_path):
    import cv2
    model, params = tiny_model
    exp = DetrExporter(model, params, input_shape=(64, 96), batch_size=2)
    path = str(tmp_path / "detr.stablehlo")
    exp.export_engine(path=path, sanity_check=False)

    handler = ModelHandler(input_size=(64, 96), threshold=0.0,
                           background_class=4,
                           labels_names=["a", "b", "c", "d", "bg"])
    handler.initialize(path)
    img = np.random.RandomState(0).randint(0, 255, (100, 120, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    results = handler.handle([bytes(enc.tobytes()), img])
    assert len(results) == 2
    import json
    dets = json.loads(results[0])
    assert isinstance(dets, list)
    for d in dets:
        assert {"label", "score", "box_xcyc_rel"} <= set(d)
