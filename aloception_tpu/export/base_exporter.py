"""Deployment export pipeline — the TensorRT-subsystem analog.

The reference exports torch -> ONNX -> graph surgery -> TRT engine with
fp16/int8 profiles and a sanity check against the torch outputs
(/root/reference/alonet/torch2trt/base_exporter.py:29 BaseTRTExporter,
TRTEngineBuilder.py:19, TRTExecutor.py:36). On TPU the pipeline is:

    flax model -> jit -> jax.export (StableHLO bytes, the engine artifact)
                -> AOT compile (the 'engine build')
                -> sanity check vs eager outputs (base_exporter.py:370)

Precision profiles map to dtype policies: fp32 / bf16 ('fp16' alias) /
int8 weights-only (quantization.py). The serialized artifact is portable and
reloadable by the Executor without the model code.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class ExportArtifact:
    """Serialized StableHLO program + metadata (the .engine analog)."""

    def __init__(self, serialized: bytes, input_specs, meta: Dict):
        self.serialized = serialized
        self.input_specs = input_specs
        self.meta = meta

    def save(self, path: str) -> str:
        import json
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(self.serialized)
        with open(path + ".json", "w") as f:
            json.dump({"meta": self.meta,
                       "input_specs": [list(map(str, s))
                                       for s in self.input_specs]}, f)
        return path

    @classmethod
    def load(cls, path: str) -> "ExportArtifact":
        import json
        with open(path, "rb") as f:
            data = f.read()
        meta, specs = {}, []
        if os.path.exists(path + ".json"):
            with open(path + ".json") as f:
                j = json.load(f)
            meta, specs = j.get("meta", {}), j.get("input_specs", [])
        return cls(data, specs, meta)


class BaseExporter:
    """(base_exporter.py:29) Subclasses provide ``build_fn`` (a pure
    params-closed forward) and ``example_inputs``."""

    def __init__(self, model, params, precision: str = "fp32",
                 batch_size: int = 1, sanity_atol: float = 1e-2,
                 name: str = "model"):
        assert precision in ("fp32", "bf16", "fp16", "mix")
        self.model = model
        self.params = params
        self.precision = precision
        self.batch_size = batch_size
        self.sanity_atol = sanity_atol
        self.name = name

    # hooks ---------------------------------------------------------------
    def build_fn(self) -> Callable:
        """Return fn(*inputs) with params closed over (tracing=True analog,
        detr.py:116)."""
        params = self.adapt_params(self.params)

        def fn(*inputs):
            return self.model.apply(params, *inputs)
        return fn

    def example_inputs(self) -> Tuple:
        raise NotImplementedError

    def adapt_params(self, params):
        """Precision adaptation (the adapt_graph analog, base_exporter.py:205)."""
        if self.precision in ("bf16", "fp16", "mix"):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        return params

    def adapt_outputs(self, outputs):
        """Select/flatten exported outputs; default passthrough."""
        return outputs

    # pipeline ------------------------------------------------------------
    def export_engine(self, path: Optional[str] = None,
                      sanity_check: bool = True) -> ExportArtifact:
        """(base_exporter.py:410 export_engine)"""
        from jax import export as jexport

        fn = self.build_fn()
        inputs = self.example_inputs()

        def wrapped(*xs):
            return self.adapt_outputs(fn(*xs))

        jitted = jax.jit(wrapped)
        exported = jexport.export(jitted)(
            *jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                          inputs))
        serialized = exported.serialize()
        artifact = ExportArtifact(
            serialized,
            input_specs=[(tuple(x.shape), x.dtype) for x in inputs],
            meta={"name": self.name, "precision": self.precision,
                  "platforms": list(exported.platforms)})

        if sanity_check:
            self.sanity_check(artifact, inputs, wrapped)
        if path is not None:
            artifact.save(path)
        return artifact

    def sanity_check(self, artifact: ExportArtifact, inputs, eager_fn):
        """Exported program vs eager outputs (base_exporter.py:370)."""
        from jax import export as jexport
        reloaded = jexport.deserialize(artifact.serialized)
        out_e = jax.tree.leaves(eager_fn(*inputs))
        out_x = jax.tree.leaves(reloaded.call(*inputs))
        for a, b in zip(out_e, out_x):
            diff = float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                         - jnp.asarray(b, jnp.float32))))
            if diff > self.sanity_atol:
                raise AssertionError(
                    f"sanity check failed: exported vs eager diff {diff} > "
                    f"{self.sanity_atol}")

    def profile(self, n_iters: int = 10) -> Dict[str, float]:
        """Latency/FLOPs report (the TRT layer-profiler analog,
        TRTExecutor.py:13)."""
        fn = jax.jit(self.build_fn())
        inputs = self.example_inputs()
        lowered = fn.lower(*inputs)
        compiled = lowered.compile()
        cost = compiled.cost_analysis() or {}
        out = fn(*inputs)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn(*inputs)
        _sync(out)
        dt = (time.perf_counter() - t0) / n_iters
        return {"latency_ms": dt * 1e3,
                "flops": float(cost.get("flops", 0.0)),
                "tflops_s": float(cost.get("flops", 0.0)) / dt / 1e12}


def _sync(tree):
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])  # host fetch: the only true sync on axon
