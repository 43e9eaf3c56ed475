"""Jitted train steps.

One jit region per optimizer step (the reference's training_step,
alonet/detr/train.py:129, minus the Lightning machinery): forward +
criterion + backward + optimizer update. Data parallelism is implicit —
inputs arrive dp-sharded (parallel/shard.py) and jit inserts the gradient
all-reduce over the mesh.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.detr.criterion import detr_criterion


def make_detr_train_step(model, criterion: Callable = detr_criterion,
                         criterion_kwargs: Optional[Dict] = None,
                         donate: bool = True, jit: bool = True):
    """Returns jitted step(state, images, mask, targets) -> (state, metrics).

    ``jit=False`` returns the raw python step for callers that embed it in
    a larger jitted program (e.g. a lax.scan block of K chained steps —
    scripts/train_geometry_tpu.py, bench.py) so benchmarks measure the
    SAME step body training runs, not a re-implementation."""
    criterion_kwargs = criterion_kwargs or {}

    def step(state, images, mask, targets):
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params):
            out = model.apply(params, images, mask, deterministic=False,
                              rngs={"dropout": rng})
            # criterion always in fp32: bf16 log_softmax/L1 rounding starves
            # the matching gradient and stalls training (DEVELOPMENT.md,
            # 'Training precision'); no-op for fp32 models
            out = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if isinstance(x, jax.Array) and jnp.issubdtype(
                    x.dtype, jnp.floating) else x, out)
            loss, metrics = criterion(out, targets, **criterion_kwargs)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda g: jnp.sum(g.astype(jnp.float32) ** 2), grads)) ** 0.5
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, criterion: Callable = detr_criterion,
                   criterion_kwargs: Optional[Dict] = None):
    criterion_kwargs = criterion_kwargs or {}

    def step(params, images, mask, targets):
        out = model.apply(params, images, mask, deterministic=True)
        loss, metrics = criterion(out, targets, **criterion_kwargs)
        return out, metrics

    return jax.jit(step)
