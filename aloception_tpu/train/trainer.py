"""Generic training driver — the ``run_pl_training`` analog
(reference: alonet/common/pl_helpers.py:295 and BaseLightningModule,
common/base_lightningmodule.py:9).

A Trainer owns: model + criterion (one jitted train step), the device mesh
(data parallel by default), optimizer/TrainState, checkpointing (best/last by
monitor), logging, and the callback list. ``fit`` runs epochs of the train
loader with periodic validation; everything batch-shaped moves through
parallel/shard.py so multi-chip runs need no code change.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..parallel import make_mesh, shard_batch, partition_params
from .callbacks import Callback, MetricsCallback
from .checkpoint import CheckpointManager
from .experiment import get_expe_infos
from .logger import make_logger
from .state import make_train_state, make_optimizer


class Trainer:

    def __init__(self, model, criterion: Callable,
                 prepare_batch: Callable,
                 inference_fn: Optional[Callable] = None,
                 mesh=None, tp: Optional[int] = None,
                 fsdp: bool = False,
                 optimizer=None, lr: float = 1e-4, lr_backbone: float = 1e-5,
                 weight_decay: float = 1e-4, grad_clip: float = 0.1,
                 accumulate_grad_batches: int = 1,
                 project: str = "default", expe_name: str = "run",
                 log: Optional[str] = None, log_dir: Optional[str] = None,
                 run_id: Optional[str] = None,
                 monitor: str = "val_loss_total", monitor_mode: str = "min",
                 save_top_k: int = 1,
                 callbacks: Optional[List[Callback]] = None,
                 val_check_interval: Optional[int] = None,
                 limit_train_batches: Optional[int] = None,
                 limit_val_batches: Optional[int] = None,
                 steps_per_dispatch: int = 1,
                 seed: int = 0):
        self.model = model
        self.criterion = criterion
        self.prepare_batch = prepare_batch
        self.inference_fn = inference_fn
        self.mesh = mesh if mesh is not None else make_mesh(tp=tp)
        self.fsdp = fsdp
        self.optimizer = optimizer if optimizer is not None else make_optimizer(
            lr=lr, lr_backbone=lr_backbone, weight_decay=weight_decay,
            grad_clip=grad_clip, accumulate_steps=accumulate_grad_batches)
        self.expe_name, self.run_id, self.ckpt_dir = get_expe_infos(
            project, expe_name, log_dir=log_dir, run_id=run_id)
        self.logger = make_logger(log, self.ckpt_dir)
        self.ckpt = CheckpointManager(self.ckpt_dir, monitor=monitor,
                                      mode=monitor_mode, save_top_k=save_top_k)
        self.callbacks = callbacks if callbacks is not None else [MetricsCallback()]
        self.val_check_interval = val_check_interval
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        # K > 1 = scan-blocked dispatch: K train steps (K successive
        # batches, stacked on a leading axis) run as ONE jitted lax.scan
        # per dispatch, with ONE host metric fetch for the block. On the
        # tunneled TPU a host fetch is the only true synchronization
        # (DEVELOPMENT.md timing notes), so per-step fetches serialize the
        # pipeline; the overfit runs use the same pattern (25-step blocks).
        # Batches whose padded shapes differ never share a block.
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self.seed = seed
        self.state = None
        self.global_step = 0
        self.last_val_metrics: Dict[str, float] = {}
        self._train_step = None
        self._train_block = None
        self._eval_step = None
        self._metric_keys = None
        self._block_buf: List[Dict] = []
        self._block_sig = None
        self._last_val_step = 0

    # ------------------------------------------------------------------
    def _build_steps(self):
        model, criterion = self.model, self.criterion

        def pack(metrics):
            # ONE device array for all scalar metrics: device_get on a dict
            # of scalars costs one tunnel round-trip PER LEAF on this backend.
            # Keys are captured at trace time (strings can't leave jit).
            keys = sorted(metrics)
            self._metric_keys = keys
            return jnp.stack([metrics[k].astype(jnp.float32).reshape(())
                              for k in keys])

        def train_step(state, batch):
            rng = jax.random.fold_in(state.dropout_rng, state.step)
            has_bs = state.batch_stats is not None  # static (None pytree)

            def loss_fn(params):
                variables = ({**params, "batch_stats": state.batch_stats}
                             if has_bs else params)
                if has_bs:
                    out, mut = model.apply(
                        variables, *batch["inputs"], deterministic=False,
                        rngs={"dropout": rng}, mutable=["batch_stats"])
                else:
                    out = model.apply(variables, *batch["inputs"],
                                      deterministic=False,
                                      rngs={"dropout": rng})
                    mut = None
                loss, metrics = criterion(out, batch["targets"])
                return loss, (metrics, mut)

            (loss, (metrics, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if has_bs:
                state = state.replace(batch_stats=mut["batch_stats"])
            return state, pack(metrics)

        def eval_step(state, batch):
            out = model.apply(state.variables(), *batch["inputs"],
                              deterministic=True)
            loss, metrics = criterion(out, batch["targets"])
            return out, pack(metrics)

        self._train_step = jax.jit(train_step, donate_argnums=(0,),
                                   static_argnums=())
        self._eval_step = jax.jit(eval_step)

        if self.steps_per_dispatch > 1:
            def train_block(state, stacked):
                # stacked: every batch leaf gains a leading (K,) axis
                return jax.lax.scan(train_step, state, stacked)
            self._train_block = jax.jit(train_block, donate_argnums=(0,))

    def _init_state(self, batch):
        params = self.model.init(jax.random.PRNGKey(self.seed),
                                 *batch["inputs"])
        with self.mesh:
            params = partition_params(params, self.mesh, fsdp=self.fsdp)
            state = make_train_state(self.model, params, tx=self.optimizer,
                                     rng=jax.random.PRNGKey(self.seed + 1))
            # Adam moments shard like their params (tp and fsdp both) —
            # optax state paths end with the same names, so one rule covers
            # both trees; scalars (count, schedule step) replicate.
            self.state = state.replace(
                opt_state=partition_params(state.opt_state, self.mesh,
                                           fsdp=self.fsdp))

    def _device_batch(self, prepared: Dict) -> Dict:
        with self.mesh:
            return shard_batch(
                {"inputs": prepared["inputs"], "targets": prepared["targets"]},
                self.mesh)

    def _flush_block(self):
        """Dispatch the buffered batches as one scan block (or one plain
        step for a singleton), fetch the block's metrics in one transfer,
        and fire per-step callbacks."""
        buf, self._block_buf, self._block_sig = self._block_buf, [], None
        if not buf:
            return
        if len(buf) == 1:
            batch = self._device_batch(buf[0])
            with self.mesh:
                self.state, metrics = self._train_step(self.state, batch)
            rows = np.asarray(metrics)[None]
        else:
            block = self._device_block(buf)
            with self.mesh:
                self.state, metrics = self._train_block(self.state, block)
            rows = np.asarray(metrics)                 # (K, M), one fetch
        for row in rows:
            self.global_step += 1
            md = dict(zip(self._metric_keys, row.tolist()))
            for cb in self.callbacks:
                cb.on_train_batch_end(self, md, self.global_step)

    def _device_block(self, buffer: List[Dict]) -> Dict:
        """Stack K prepared host batches on a leading axis and place them
        with dp on axis 1 (the per-step batch axis)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[{"inputs": b["inputs"], "targets": b["targets"]}
              for b in buffer])
        dp = self.mesh.shape.get("dp", 1)

        def _put(x):
            if x.ndim >= 2 and x.shape[1] % dp == 0:
                spec = P(None, "dp", *([None] * (x.ndim - 2)))
            else:
                spec = P()
            return jax.device_put(x, NamedSharding(self.mesh, spec))
        return jax.tree_util.tree_map(_put, stacked)

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None, max_epochs: int = 1,
            max_steps: Optional[int] = None, resume: bool = False):
        """(pl_helpers.py:377 trainer.fit)"""
        if self._train_step is None:
            self._build_steps()
        t0 = time.time()
        for epoch in range(max_epochs):
            for i, raw in enumerate(train_loader):
                if self.limit_train_batches and i >= self.limit_train_batches:
                    break
                prepared = self.prepare_batch(raw)
                batch = self._device_batch(prepared) \
                    if self.steps_per_dispatch == 1 or self.state is None \
                    else None
                if self.state is None:
                    self._init_state(batch)
                    if resume:
                        try:
                            restored = self.ckpt.restore(
                                jax.device_get(self.state))
                            # re-place restored arrays onto the mesh (orbax
                            # restores to a single device)
                            with self.mesh:
                                self.state = self.state.replace(
                                    params=partition_params(
                                        restored.params, self.mesh,
                                        fsdp=self.fsdp),
                                    opt_state=partition_params(
                                        restored.opt_state, self.mesh,
                                        fsdp=self.fsdp),
                                    step=restored.step,
                                    dropout_rng=jnp.asarray(
                                        restored.dropout_rng),
                                    batch_stats=(
                                        partition_params(
                                            restored.batch_stats, self.mesh)
                                        if restored.batch_stats is not None
                                        else None))
                            self.global_step = int(restored.step)
                            print(f"[trainer] resumed from step "
                                  f"{self.ckpt.last_step()}")
                        except FileNotFoundError:
                            pass
                K = self.steps_per_dispatch
                if K > 1:
                    sig = tuple(
                        tuple(np.shape(x))
                        for x in jax.tree_util.tree_leaves(prepared))
                    if self._block_buf and sig != self._block_sig:
                        self._flush_block()  # shape changed: new bucket
                    self._block_buf.append(prepared)
                    self._block_sig = sig
                    if len(self._block_buf) >= K:
                        self._flush_block()
                else:
                    with self.mesh:
                        self.state, metrics = self._train_step(self.state,
                                                               batch)
                    self.global_step += 1
                    vals = np.asarray(metrics)  # single transfer
                    metrics = dict(zip(self._metric_keys, vals.tolist()))
                    for cb in self.callbacks:
                        cb.on_train_batch_end(self, metrics,
                                              self.global_step)
                if max_steps and self.global_step + len(self._block_buf) \
                        >= max_steps:
                    break
                # boundary-crossing check, not modulo: with
                # steps_per_dispatch=K the step advances in jumps of K,
                # which would skip non-multiple intervals entirely
                if (self.val_check_interval
                        and not self._block_buf
                        and self.global_step // self.val_check_interval
                        > self._last_val_step // self.val_check_interval
                        and val_loader is not None):
                    self._last_val_step = self.global_step
                    self.validate(val_loader)
            self._flush_block()
            if val_loader is not None:
                self.validate(val_loader)
            self.ckpt.save(self.global_step, self.state,
                           metrics=self.last_val_metrics)
            for cb in self.callbacks:
                cb.on_epoch_end(self, epoch)
            if max_steps and self.global_step >= max_steps:
                break
        self.logger.flush()
        return self.state

    def validate(self, val_loader):
        """(pl_helpers.py:420 run_pl_validate)"""
        if self._eval_step is None:
            self._build_steps()
        assert self.state is not None, "validate() before any training step"
        for i, raw in enumerate(val_loader):
            if self.limit_val_batches and i >= self.limit_val_batches:
                break
            prepared = self.prepare_batch(raw, training=False)
            batch = self._device_batch(prepared)
            with self.mesh:
                outputs, metrics = self._eval_step(self.state, batch)
            metrics = dict(zip(self._metric_keys,
                               np.asarray(metrics).tolist()))
            outputs = jax.device_get(outputs)
            for cb in self.callbacks:
                cb.on_val_batch_end(self, outputs, prepared, metrics)
        for cb in self.callbacks:
            cb.on_val_epoch_end(self, self.global_step)
        return self.last_val_metrics
