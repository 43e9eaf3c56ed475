"""Per-model exporters (reference: alonet/detr/trt_exporter.py:14,
deformable_detr/trt_exporter.py:20, detr_panoptic/trt_exporter.py:15).

The deformable reference needs ONNX graph surgery to splice a custom TRT
plugin for its CUDA op (trt_exporter.py:43 MsDeformIm2ColTRT); here the
deformable attention is ordinary lax/Pallas, so the export path is uniform —
no plugin machinery needed (the TRT plugin is obsolete by design,
SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .base_exporter import BaseExporter


class DetrExporter(BaseExporter):
    """(detr/trt_exporter.py:14) exports (pred_logits, pred_boxes)."""

    def __init__(self, model, params, input_shape: Tuple[int, int] = (480, 640),
                 **kwargs):
        super().__init__(model, params, name="detr", **kwargs)
        self.input_shape = input_shape

    def example_inputs(self):
        h, w = self.input_shape
        return (jnp.zeros((self.batch_size, h, w, 3), jnp.float32),
                jnp.zeros((self.batch_size, h, w), jnp.float32))

    def adapt_outputs(self, outputs):
        return {"pred_logits": outputs["pred_logits"].astype(jnp.float32),
                "pred_boxes": outputs["pred_boxes"].astype(jnp.float32)}


class DeformableDetrExporter(DetrExporter):
    """(deformable_detr/trt_exporter.py:20)"""

    def __init__(self, model, params, **kwargs):
        super().__init__(model, params, **kwargs)
        self.name = "deformable-detr"


class PanopticExporter(BaseExporter):
    """(detr_panoptic/trt_exporter.py:15) detector + head in one program."""

    def __init__(self, detector, detector_params, head, head_params,
                 input_shape: Tuple[int, int] = (480, 640), **kwargs):
        super().__init__(detector, detector_params, name="panoptic", **kwargs)
        self.head = head
        self.head_params = head_params
        self.input_shape = input_shape

    def example_inputs(self):
        h, w = self.input_shape
        return (jnp.zeros((self.batch_size, h, w, 3), jnp.float32),
                jnp.zeros((self.batch_size, h, w), jnp.float32))

    def build_fn(self):
        det_params = self.adapt_params(self.params)
        head_params = self.adapt_params(self.head_params)

        def fn(images, mask):
            out = self.model.apply(det_params, images, mask)
            return self.head.apply(head_params, out)
        return fn

    def adapt_outputs(self, outputs):
        return {"pred_logits": outputs["pred_logits"].astype(jnp.float32),
                "pred_boxes": outputs["pred_boxes"].astype(jnp.float32),
                "pred_masks": outputs["pred_masks"].astype(jnp.float32)}


class RAFTExporter(BaseExporter):
    """Fixed-iteration RAFT export (the reference exports RAFT via
    TorchScript for serving; raft/trt_exporter analog)."""

    def __init__(self, model, params, input_shape: Tuple[int, int] = (368, 496),
                 iters: int = 12, **kwargs):
        super().__init__(model, params, name="raft", **kwargs)
        self.input_shape = input_shape
        self.iters = iters

    def example_inputs(self):
        h, w = self.input_shape
        z = jnp.zeros((self.batch_size, h, w, 3), jnp.float32)
        return (z, z)

    def build_fn(self):
        params = self.adapt_params(self.params)

        def fn(f1, f2):
            return self.model.apply(params, f1, f2, iters=self.iters,
                                    only_last=True)
        return fn

    def adapt_outputs(self, outputs):
        return outputs.astype(jnp.float32)
