"""Profiling utilities — the reference has only the TRT layer-time profiler
(torch2trt/TRTExecutor.py:13); the TPU rebuild gets jax.profiler traces +
compiled cost analysis (SURVEY.md §5 tracing note).
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Dict, Optional, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aloception_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs / bytes of the compiled program (XLA's own cost model)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    ca = compiled.cost_analysis() or {}
    return {"flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
            "transcendentals": float(ca.get("transcendentals", 0.0))}


def arithmetic_intensity(fn: Callable, *example_args) -> float:
    """FLOPs per HBM byte — roofline position of the compiled program."""
    ca = cost_analysis(fn, *example_args)
    return ca["flops"] / max(ca["bytes_accessed"], 1.0)
