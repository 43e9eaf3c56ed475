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
        if hasattr(self.dataset, "train_loader"):
            loader = self.dataset.train_loader(batch_size=self.batch_size,
                                               num_workers=0, shuffle=False)
        else:  # plain iterable of ready-made batches
            loader = iter(self.dataset)
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


class HistogramCalibrator:
    """Histogram-based activation calibrator base (the reference's Legacy/
    Entropy/Entropy2 calibrators all collect histograms first,
    calibrator.py:160-241). Maintains a per-tensor |x| histogram with a
    dynamically expanding range (rebinning by power-of-two growth)."""

    def __init__(self, num_bins: int = 2048):
        self.num_bins = num_bins
        self.hists: Dict[str, np.ndarray] = {}
        self.ranges: Dict[str, float] = {}

    def observe(self, name: str, value):
        v = np.abs(np.asarray(value, np.float32)).ravel()
        vmax = float(v.max(initial=0.0))
        if vmax == 0.0 and name not in self.hists:
            return
        if name not in self.hists:
            self.hists[name] = np.zeros(self.num_bins, np.int64)
            self.ranges[name] = max(vmax, 1e-12)
        while vmax > self.ranges[name]:
            # rebin 2x: fold pairs of bins together, double the range
            h = self.hists[name]
            folded = h.reshape(self.num_bins // 2, 2).sum(1)
            self.hists[name] = np.concatenate(
                [folded, np.zeros(self.num_bins - self.num_bins // 2,
                                  np.int64)])
            self.ranges[name] *= 2
        hist, _ = np.histogram(v, bins=self.num_bins,
                               range=(0.0, self.ranges[name]))
        self.hists[name] += hist

    def calibrate(self, fn: Callable, streamer: "DataBatchStreamer",
                  names: Optional[List[str]] = None) -> Dict[str, float]:
        for batch in streamer:
            acts = fn(batch)
            for k, v in acts.items():
                if names is None or k in names:
                    self.observe(k, v)
        return self.scales()

    def scales(self, bits: int = 8) -> Dict[str, float]:
        raise NotImplementedError


class PercentileCalibrator(HistogramCalibrator):
    """Scale from the p-th percentile of |activation| — clips the extreme
    tail that would otherwise waste int8 range (the practical default among
    the reference's histogram strategies)."""

    def __init__(self, percentile: float = 99.9, num_bins: int = 2048):
        super().__init__(num_bins)
        self.percentile = percentile

    def scales(self, bits: int = 8) -> Dict[str, float]:
        qmax = 2 ** (bits - 1) - 1
        out = {}
        for k, h in self.hists.items():
            total = h.sum()
            if total == 0:
                out[k] = 1.0
                continue
            cdf = np.cumsum(h) / total
            idx = int(np.searchsorted(cdf, self.percentile / 100.0))
            idx = min(idx, self.num_bins - 1)
            amax = (idx + 1) / self.num_bins * self.ranges[k]
            out[k] = amax / qmax if amax > 0 else 1.0
        return out


class EntropyCalibrator(HistogramCalibrator):
    """KL-divergence-minimizing threshold (TensorRT's entropy calibration,
    the reference's TRTCalibratorEntropy* analog, calibrator.py:192-241):
    pick the clip point whose quantized distribution diverges least from the
    observed one."""

    def scales(self, bits: int = 8) -> Dict[str, float]:
        qmax = 2 ** (bits - 1) - 1
        levels = 2 ** (bits - 1)          # 128 magnitude levels
        out = {}
        for k, h in self.hists.items():
            total = h.sum()
            if total == 0:
                out[k] = 1.0
                continue
            h = h.astype(np.float64)
            best_i, best_kl = self.num_bins, np.inf
            for i in range(levels, self.num_bins + 1, levels // 2):
                p = h[:i].copy()
                p[-1] += h[i:].sum()        # clipped tail mass
                if p.sum() == 0:
                    continue
                # quantize the first i bins down to `levels` buckets
                factor = i / levels
                idx = (np.arange(i) / factor).astype(int)
                q_small = np.bincount(idx, weights=h[:i], minlength=levels)
                counts = np.bincount(idx, minlength=levels)
                # expand back, spreading each bucket over its source bins
                # (zero source bins stay zero, as in TRT's algorithm)
                nz = h[:i] > 0
                nz_per_bucket = np.bincount(idx, weights=nz.astype(float),
                                            minlength=levels)
                spread = np.where(nz_per_bucket[idx] > 0,
                                  q_small[idx] / np.maximum(
                                      nz_per_bucket[idx], 1), 0.0)
                q = np.where(nz, spread, 0.0)
                pn = p / p.sum()
                qs = q.sum()
                if qs == 0:
                    continue
                qn = q / qs
                mask = pn > 0
                kl = float(np.sum(pn[mask] * np.log(
                    pn[mask] / np.maximum(qn[mask], 1e-12))))
                if kl < best_kl:
                    best_kl, best_i = kl, i
            amax = best_i / self.num_bins * self.ranges[k]
            out[k] = amax / qmax if amax > 0 else 1.0
        return out


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
