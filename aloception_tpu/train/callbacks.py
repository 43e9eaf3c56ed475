"""Training callbacks (reference: alonet/callbacks/).

- MetricsCallback (metrics_callback.py:29): smoothed train scalars +
  per-val aggregation to the logger.
- ApMetricsCallback / PQMetricsCallback (map_metrics_callback.py:15,
  pq_metrics_callback.py:15 via base_metrics_callback.py:15): accumulate
  per-batch predictions, print + log at validation end.
- ObjectDetectorCallback (object_detector_callback.py:14): renders predicted
  boxes/masks on validation images to the logger.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np


class Callback:
    def on_train_batch_end(self, trainer, metrics: Dict, step: int): ...
    def on_val_batch_end(self, trainer, outputs, batch, metrics: Dict): ...
    def on_val_epoch_end(self, trainer, step: int): ...
    def on_epoch_end(self, trainer, epoch: int): ...


class MetricsCallback(Callback):
    """EMA-smoothed train scalars, mean val scalars (metrics_callback.py:29)."""

    def __init__(self, log_every: int = 10, smoothing: float = 0.9):
        self.log_every = log_every
        self.smoothing = smoothing
        self._ema: Dict[str, float] = {}
        self._val: Dict[str, List[float]] = defaultdict(list)

    def on_train_batch_end(self, trainer, metrics, step):
        for k, v in metrics.items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            self._ema[k] = v if k not in self._ema else \
                self.smoothing * self._ema[k] + (1 - self.smoothing) * v
        if step % self.log_every == 0:
            trainer.logger.log_scalars(self._ema, step, prefix="train/")

    def on_val_batch_end(self, trainer, outputs, batch, metrics):
        for k, v in metrics.items():
            try:
                self._val[k].append(float(v))
            except (TypeError, ValueError):
                pass

    def on_val_epoch_end(self, trainer, step):
        means = {k: float(np.mean(v)) for k, v in self._val.items() if v}
        trainer.logger.log_scalars(means, step, prefix="val/")
        trainer.last_val_metrics = {f"val_{k}": v for k, v in means.items()}
        self._val.clear()


class ApMetricsCallback(Callback):
    """Accumulate AP over validation (map_metrics_callback.py:15).
    Expects trainer.inference_fn(outputs) -> list of predicted boxes and the
    batch to carry ground-truth frames."""

    def __init__(self):
        from ..metrics import ApMetrics
        self._make = ApMetrics
        self.ap = ApMetrics()

    def on_val_batch_end(self, trainer, outputs, batch, metrics):
        frames = batch.get("frames")
        if frames is None or trainer.inference_fn is None:
            return
        p_boxes = trainer.inference_fn(outputs)
        gt_list = frames.boxes2d if isinstance(frames.boxes2d, list) \
            else [frames.boxes2d]
        for p, t in zip(p_boxes, gt_list):
            if t is not None and t.shape[0] >= 0:
                self.ap.add_sample(p, t)

    def on_val_epoch_end(self, trainer, step):
        if self.ap.ap_data is None:
            return
        all_maps, _ = self.ap.calc_map(print_result=True)
        trainer.logger.log_scalars(
            {f"AP{k}": v for k, v in all_maps["all"].items()}, step,
            prefix="val/")
        self.ap = self._make()


class ObjectDetectorCallback(Callback):
    """Render first-val-batch predictions to the logger
    (object_detector_callback.py:42-196)."""

    def __init__(self, max_images: int = 4):
        self.max_images = max_images
        self._logged_this_epoch = False

    def on_val_batch_end(self, trainer, outputs, batch, metrics):
        if self._logged_this_epoch or trainer.inference_fn is None:
            return
        frames = batch.get("frames")
        if frames is None:
            return
        p_boxes = trainer.inference_fn(outputs)
        for b in range(min(self.max_images, len(p_boxes))):
            frame = frames[b] if frames.has_dim("B") else frames
            view = p_boxes[b].get_view(
                frame=np.clip(frame.norm01().as_image(np.float32) / 255, 0, 1)
                if hasattr(frame, "norm01") else None,
                frame_size=frame.HW)
            trainer.logger.log_image(f"val/pred_boxes_{b}", view.image,
                                     trainer.global_step)
        self._logged_this_epoch = True

    def on_val_epoch_end(self, trainer, step):
        self._logged_this_epoch = False


class PQMetricsCallback(Callback):
    """Accumulate panoptic quality over validation
    (pq_metrics_callback.py:15). Needs trainer.inference_fn returning
    (boxes, masks) pairs and gt segmentation on the frames."""

    def __init__(self, isthing=None):
        from ..metrics import PQMetrics
        self._make = PQMetrics
        self.pq = PQMetrics()
        self.isthing = isthing

    def on_val_batch_end(self, trainer, outputs, batch, metrics):
        frames = batch.get("frames")
        if frames is None or trainer.inference_fn is None:
            return
        seg_slot = frames.get_child("segmentation")
        seg_list = seg_slot if isinstance(seg_slot, list) else [seg_slot]
        # pred_masks are stride-4; PQ matches pixelwise against the
        # full-resolution GT, so ask the inference fn to upsample
        # (inference_with_masks frame_size; reference detr_panoptic.py:239)
        fs = next((tuple(g.shape[-2:]) for g in seg_list
                   if g is not None and not isinstance(g, dict)), None)
        # probe the signature rather than catching TypeError around the
        # call — a genuine TypeError inside the inference body must not be
        # silently retried without upsampling
        import inspect
        takes_fs = False
        try:
            sig = inspect.signature(trainer.inference_fn)
            takes_fs = "frame_size" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values())
        except (TypeError, ValueError):
            pass
        results = trainer.inference_fn(outputs, frame_size=fs) \
            if (fs and takes_fs) else trainer.inference_fn(outputs)
        for (boxes, masks), gt in zip(results, seg_list):
            if gt is not None and not isinstance(gt, dict):
                self.pq.add_sample(masks, gt, isthing=self.isthing)

    def on_val_epoch_end(self, trainer, step):
        for isthing, tag in ((None, "all"), (True, "things"), (False, "stuff")):
            out = self.pq.pq_average(isthing=isthing, print_result=True)
            trainer.logger.log_scalars(
                {f"PQ_{tag}_{k}": v for k, v in out.items()}, step,
                prefix="val/")
        self.pq = self._make()


class EPECallback(Callback):
    """End-point-error accumulation for flow models
    (reference: alonet/raft/callbacks/epe.py:7). The RAFT criterion already
    emits epe/1px/3px/5px; this callback aggregates + logs them."""

    def __init__(self):
        self._epes = []

    def on_val_batch_end(self, trainer, outputs, batch, metrics):
        if "epe" in metrics:
            self._epes.append(float(metrics["epe"]))

    def on_val_epoch_end(self, trainer, step):
        if self._epes:
            epe = float(np.mean(self._epes))
            trainer.logger.log_scalar("val/EPE", epe, step)
            print(f"[EPE] {epe:.4f} over {len(self._epes)} val batches")
            self._epes = []
