"""Executor: load + run serialized export artifacts
(reference: alonet/torch2trt/TRTExecutor.py:36 TRTExecutor with host/device
buffers and the layer-time Profiler:13)."""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np
import jax

from .base_exporter import ExportArtifact


class Profiler:
    """(TRTExecutor.py:13) accumulate per-call latency."""

    def __init__(self):
        self.times: List[float] = []

    def record(self, dt: float):
        self.times.append(dt)

    def report(self) -> Dict[str, float]:
        t = np.asarray(self.times) if self.times else np.zeros(1)
        return {"mean_ms": float(t.mean() * 1e3),
                "p50_ms": float(np.percentile(t, 50) * 1e3),
                "p99_ms": float(np.percentile(t, 99) * 1e3),
                "calls": len(self.times)}


class Executor:
    """Run a serialized StableHLO artifact (TRTExecutor.py:36 analog)."""

    def __init__(self, artifact, profiling: bool = False):
        from jax import export as jexport
        if isinstance(artifact, (str,)):
            artifact = ExportArtifact.load(artifact)
        if isinstance(artifact, ExportArtifact):
            self._exported = jexport.deserialize(artifact.serialized)
            self.meta = artifact.meta
        else:  # already a jax.export.Exported
            self._exported = artifact
            self.meta = {}
        self.profiler = Profiler() if profiling else None

    def __call__(self, *inputs):
        if self.profiler is None:
            return self._exported.call(*inputs)
        t0 = time.perf_counter()
        out = self._exported.call(*inputs)
        np.asarray(jax.tree.leaves(out)[0])  # host-fetch sync
        self.profiler.record(time.perf_counter() - t0)
        return out

    def execute(self, inputs: Dict[str, np.ndarray]) -> Any:
        """Dict-style call for serving handlers."""
        return self(*inputs.values())
