"""Production serving handler (reference: alonet/detr/production/
model_handler.py:23 torchserve ModelHandler): preprocess raw image bytes ->
batched inference on an exported artifact -> JSON boxes."""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np


class ModelHandler:
    """preprocess / inference / postprocess (model_handler.py:23-131)."""

    def __init__(self, input_size=(480, 640), threshold: float = 0.2,
                 background_class: Optional[int] = 91,
                 labels_names: Optional[List[str]] = None):
        self.input_size = tuple(input_size)
        self.threshold = threshold
        self.background_class = background_class
        self.labels_names = labels_names
        self.executor = None
        self.initialized = False

    def initialize(self, artifact_path: str):
        """(model_handler.py initialize) load the exported engine."""
        from ..executor import Executor
        self.executor = Executor(artifact_path, profiling=True)
        self.initialized = True

    def preprocess(self, batch: List[Any]) -> Dict[str, np.ndarray]:
        """Raw image bytes/arrays -> resnet-normalized NHWC batch + mask
        (model_handler.py preprocess)."""
        import cv2
        from ...aloscene import Frame

        h, w = self.input_size
        images, masks = [], []
        for item in batch:
            if isinstance(item, (bytes, bytearray)):
                arr = cv2.imdecode(np.frombuffer(item, np.uint8),
                                   cv2.IMREAD_COLOR)
                arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
                frame = Frame(arr.transpose(2, 0, 1).astype(np.float32))
            elif isinstance(item, np.ndarray):
                frame = Frame(item.transpose(2, 0, 1).astype(np.float32))
            else:
                frame = item  # already a Frame
            frame = frame.norm_resnet().resize((h, w))
            images.append(np.asarray(frame.as_layout(("H", "W", "C"))))
            masks.append(np.zeros((h, w), np.float32))
        return {"images": np.stack(images), "mask": np.stack(masks)}

    def inference(self, inputs: Dict[str, np.ndarray]):
        assert self.initialized, "call initialize(artifact_path) first"
        return self.executor(inputs["images"], inputs["mask"])

    def postprocess(self, outputs) -> List[str]:
        """Model dict -> JSON boxes per image (model_handler.py postprocess)."""
        logits = np.asarray(outputs["pred_logits"])
        boxes = np.asarray(outputs["pred_boxes"])
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        labels = probs.argmax(-1)
        scores = probs.max(-1)
        results = []
        for b in range(logits.shape[0]):
            keep = scores[b] > self.threshold
            if self.background_class is not None:
                keep &= labels[b] != self.background_class
            dets = []
            for q in np.nonzero(keep)[0]:
                xc, yc, w_, h_ = boxes[b, q].tolist()
                name = self.labels_names[int(labels[b, q])] \
                    if self.labels_names else int(labels[b, q])
                dets.append({"label": name, "score": float(scores[b, q]),
                             "box_xcyc_rel": [xc, yc, w_, h_]})
            results.append(json.dumps(dets))
        return results

    def handle(self, batch: List[Any]) -> List[str]:
        return self.postprocess(self.inference(self.preprocess(batch)))
