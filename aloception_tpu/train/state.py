"""Training state + optimizer construction.

Mirrors the reference DETR training config (alonet/detr/train.py:202-218):
AdamW lr 1e-4 / backbone lr 1e-5 / weight decay 1e-4, gradient clipping 0.1
and gradient accumulation (train.py:79-82 defaults) — expressed as an optax
chain with pytree masks instead of torch param groups. Frozen-BN statistics
are masked out entirely (requires_grad=False analog, backbone.py:17).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
import flax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState; dropout rng folded in per step."""
    dropout_rng: Any = None


def _path_names(path):
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def _is_frozen_bn(path) -> bool:
    return any(str(n).startswith(("bn", "downsample_bn")) for n in _path_names(path))


def _is_backbone(path) -> bool:
    return any(str(n) == "backbone" for n in _path_names(path))


def make_optimizer(lr: float = 1e-4, lr_backbone: float = 1e-5,
                   weight_decay: float = 1e-4, grad_clip: float = 0.1,
                   accumulate_steps: int = 1,
                   schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    """AdamW with per-group LR via optax.masked chains (train.py:202-218)."""
    main_lr = schedule if schedule is not None else lr
    scale = lr_backbone / lr if lr > 0 else 1.0

    def backbone_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _is_backbone(path) and not _is_frozen_bn(path), params)

    def head_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (not _is_backbone(path)) and not _is_frozen_bn(path),
            params)

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.masked(optax.adamw(main_lr, weight_decay=weight_decay), head_mask),
        optax.masked(optax.adamw(
            (lambda step: schedule(step) * scale) if schedule is not None
            else lr_backbone,
            weight_decay=weight_decay), backbone_mask),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def make_train_state(model, params, tx=None, rng=None, **opt_kwargs) -> TrainState:
    tx = tx if tx is not None else make_optimizer(**opt_kwargs)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx,
        dropout_rng=rng if rng is not None else jax.random.PRNGKey(0))
