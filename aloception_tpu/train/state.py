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
    """flax TrainState; dropout rng folded in per step. ``batch_stats``
    carries BatchNorm running statistics for models that have them (RAFT's
    cnet, extractor.py) — None for purely stateless models."""
    dropout_rng: Any = None
    batch_stats: Any = None

    def variables(self):
        """Full variables dict for model.apply."""
        if self.batch_stats is not None:
            return {**self.params, "batch_stats": self.batch_stats}
        return self.params


def _path_names(path):
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def _is_frozen_bn(path) -> bool:
    return any(str(n).startswith(("bn", "downsample_bn")) for n in _path_names(path))


def _is_backbone(path) -> bool:
    return any(str(n) == "backbone" for n in _path_names(path))


def onecycle_schedule(peak_lr: float, total_steps: int,
                      pct_start: float = 0.05, div_factor: float = 25.0,
                      final_div_factor: float = 1e4) -> Callable:
    """torch OneCycleLR with anneal_strategy='linear' (the RAFT schedule,
    reference alonet/raft/train.py:79-86): linear warmup peak/div_factor ->
    peak over pct_start, then linear anneal to peak/div_factor/
    final_div_factor. Returns an optax-style step -> lr callable."""
    import jax.numpy as _jnp
    init = peak_lr / div_factor
    final = init / final_div_factor
    warm = max(1, int(total_steps * pct_start))
    down_steps = max(1, total_steps - warm)

    def schedule(step):
        s = _jnp.minimum(step, total_steps).astype(_jnp.float32)
        up = init + (peak_lr - init) * (s / warm)
        down = peak_lr + (final - peak_lr) * ((s - warm) / down_steps)
        return _jnp.where(s < warm, up, down)

    return schedule


def make_optimizer(lr: float = 1e-4, lr_backbone: float = 1e-5,
                   weight_decay: float = 1e-4, grad_clip: float = 0.1,
                   accumulate_steps: int = 1,
                   schedule: Optional[Callable] = None,
                   freeze_prefixes: tuple = ()) -> optax.GradientTransformation:
    """AdamW with per-group LR via optax.masked chains (train.py:202-218).

    ``freeze_prefixes``: param-path names whose subtrees are fully frozen —
    grads zeroed AND excluded from both adamw groups, so decoupled weight
    decay cannot drift them (torch requires_grad=False semantics; used for
    PanopticHead's frozen detector, reference detr_panoptic.py:80)."""
    main_lr = schedule if schedule is not None else lr
    scale = lr_backbone / lr if lr > 0 else 1.0

    def _is_frozen(path) -> bool:
        return _is_frozen_bn(path) or any(
            str(n) in freeze_prefixes for n in _path_names(path))

    def backbone_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _is_backbone(path) and not _is_frozen(path), params)

    def head_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: (not _is_backbone(path)) and not _is_frozen(path),
            params)

    def frozen_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _is_frozen(path), params)

    # Frozen-BN grads are zeroed FIRST: optax.masked passes unmasked updates
    # through unchanged, so without this the raw (clipped) gradient would leak
    # into the frozen stats; zeroing before the clip also keeps them out of
    # the global norm, matching torch requires_grad=False semantics
    # (reference backbone.py:17 FrozenBatchNorm2d).
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
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
    """``params`` is the full model.init output; a ``batch_stats`` collection
    (if any) is split out of the optimizer-visible tree."""
    tx = tx if tx is not None else make_optimizer(**opt_kwargs)
    batch_stats = None
    if isinstance(params, dict) and "batch_stats" in params:
        batch_stats = params["batch_stats"]
        params = {k: v for k, v in params.items() if k != "batch_stats"}
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats,
        dropout_rng=rng if rng is not None else jax.random.PRNGKey(0))
