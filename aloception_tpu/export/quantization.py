"""Quantization for deployment (reference: alonet/torch2trt/calibrator.py:10-241
DataBatchStreamer + INT8 calibrators, quantization.py:12 QuantizedModel).

TPU-native equivalents:
- weights-only int8: per-channel absmax scales, dequantized on the fly
  (XLA fuses the dequant multiply into the matmul)
- activation calibration: a DataBatchStreamer feeding batches through the
  model while range observers collect per-tensor absmax (the MinMax
  calibrator analog); ranges drive static int8 activation scales.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def quantize_weights_int8(params, min_size: int = 1024):
    """Per-output-channel absmax int8 quantization of large 2D kernels.

    Returns (quantized pytree with {'q': int8, 'scale': f32} leaves replacing
    large kernels, dequant_fn to reconstruct a dense f32 pytree).
    """
    def _q(path, x):
        names = [getattr(p, "key", str(p)) for p in path]
        if (names and names[-1] == "kernel" and getattr(x, "ndim", 0) == 2
                and x.size >= min_size):
            scale = jnp.max(jnp.abs(x), axis=0, keepdims=True) / 127.0
            scale = jnp.where(scale == 0, 1.0, scale)
            q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
            return {"q": q, "scale": scale.astype(jnp.float32)}
        return x

    quantized = jax.tree_util.tree_map_with_path(_q, params)

    def dequant(tree):
        def _dq(x):
            if isinstance(x, dict) and set(x) == {"q", "scale"}:
                return x["q"].astype(jnp.float32) * x["scale"]
            return x
        return jax.tree.map(_dq, tree,
                            is_leaf=lambda x: isinstance(x, dict)
                            and set(x) == {"q", "scale"})
    return quantized, dequant


def quantization_error(params, quantized, dequant) -> float:
    """Max relative reconstruction error over quantized kernels."""
    dense = dequant(quantized)
    errs = []
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(dense)):
        if getattr(a, "ndim", 0) == 2:
            denom = float(jnp.max(jnp.abs(a))) or 1.0
            errs.append(float(jnp.max(jnp.abs(a - b))) / denom)
    return max(errs) if errs else 0.0


class DataBatchStreamer:
    """(calibrator.py:10 DataBatchStreamer) iterate calibration batches."""

    def __init__(self, dataset, batch_size: int = 1, max_batches: int = 8,
                 prepare: Optional[Callable] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_batches = max_batches
        self.prepare = prepare

    def __iter__(self) -> Iterator:
        loader = self.dataset.train_loader(batch_size=self.batch_size,
                                           num_workers=0, shuffle=False)
        for i, batch in enumerate(loader):
            if i >= self.max_batches:
                break
            yield self.prepare(batch) if self.prepare else batch


class MinMaxCalibrator:
    """(calibrator.py:133 TRTCalibratorMinMax analog) collect activation
    absmax ranges over calibration data."""

    def __init__(self):
        self.ranges: Dict[str, float] = {}

    def observe(self, name: str, value):
        v = float(jnp.max(jnp.abs(value)))
        self.ranges[name] = max(self.ranges.get(name, 0.0), v)

    def scales(self, bits: int = 8) -> Dict[str, float]:
        qmax = 2 ** (bits - 1) - 1
        return {k: (v / qmax if v > 0 else 1.0) for k, v in self.ranges.items()}

    def calibrate(self, fn: Callable, streamer: DataBatchStreamer,
                  names: Optional[List[str]] = None):
        """Run fn over the streamer; fn returns {name: activation} to observe."""
        for batch in streamer:
            acts = fn(batch)
            for k, v in acts.items():
                if names is None or k in names:
                    self.observe(k, v)
        return self.scales()


def fake_quant(x, bits: int = 8, axis: int = -1):
    """Straight-through fake quantization — the QAT building block
    (reference: torch2trt/quantization.py:12 QuantizedModel wraps layers in
    pytorch-quantization fake-quant nodes; here it's one differentiable
    function to insert in a flax module)."""
    qmax = 2.0 ** (bits - 1) - 1
    scale = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / qmax
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax) * scale
    # straight-through estimator: identity gradient
    return x + jax.lax.stop_gradient(q - x)


def quantize_params_for_qat(params, bits: int = 8, min_size: int = 1024):
    """Apply fake-quant to every large kernel — simulate int8 deployment
    during finetuning (QAT), so the exported int8 engine matches training."""
    def _fq(path, x):
        names = [getattr(p, "key", str(p)) for p in path]
        if (names and names[-1] == "kernel" and getattr(x, "ndim", 0) >= 2
                and x.size >= min_size):
            return fake_quant(x, bits=bits, axis=tuple(range(x.ndim - 1)))
        return x
    return jax.tree_util.tree_map_with_path(_fq, params)
