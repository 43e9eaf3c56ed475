"""Checkpointing with best/last/monitor semantics on orbax
(reference: alonet/common/pl_helpers.py:133-176 checkpoint_handler and the
ModelCheckpoint config at pl_helpers.py:352-362).

Layout: <ckpt_dir>/<step>/ orbax checkpoints plus a ``registry.json``
recording each save's monitored metrics, so "best" resolves from the
registry exactly like the reference parses monitor values out of filenames.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


class CheckpointManager:

    def __init__(self, ckpt_dir: str, monitor: str = "val_loss",
                 mode: str = "min", save_top_k: int = 1,
                 save_last: bool = True):
        import orbax.checkpoint as ocp
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.save_last = save_last
        self._ckptr = ocp.StandardCheckpointer()
        self._registry_path = os.path.join(self.ckpt_dir, "registry.json")
        self._registry: Dict[str, Dict] = self._load_registry()

    def _load_registry(self) -> Dict:
        if os.path.exists(self._registry_path):
            with open(self._registry_path) as f:
                return json.load(f)
        return {}

    def _save_registry(self):
        with open(self._registry_path, "w") as f:
            json.dump(self._registry, f, indent=2)

    def save(self, step: int, state: Any, metrics: Optional[Dict] = None):
        """Save a checkpoint; prune beyond save_top_k by the monitor."""
        path = os.path.join(self.ckpt_dir, str(step))
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        self._registry[str(step)] = metrics
        self._save_registry()
        self._prune()

    def _monitored(self, step: str) -> float:
        v = self._registry.get(step, {}).get(self.monitor)
        if v is None:
            return np.inf if self.mode == "min" else -np.inf
        return v

    def _prune(self):
        steps = sorted(self._registry, key=int)
        if len(steps) <= self.save_top_k + (1 if self.save_last else 0):
            return
        last = steps[-1]
        candidates = steps[:-1] if self.save_last else steps
        ranked = sorted(candidates, key=self._monitored,
                        reverse=(self.mode == "max"))
        keep = set(ranked[:self.save_top_k]) | ({last} if self.save_last else set())
        for s in steps:
            if s not in keep:
                import shutil
                shutil.rmtree(os.path.join(self.ckpt_dir, s),
                              ignore_errors=True)
                self._registry.pop(s, None)
        self._save_registry()

    def best_step(self) -> Optional[int]:
        """(pl_helpers.py:133 'best' resolution)"""
        if not self._registry:
            return None
        ranked = sorted(self._registry, key=self._monitored,
                        reverse=(self.mode == "max"))
        return int(ranked[0])

    def last_step(self) -> Optional[int]:
        steps = [int(s) for s in self._registry]
        return max(steps) if steps else None

    def restore(self, target: Any, step: Optional[int] = None,
                best: bool = False) -> Any:
        """Restore into a pytree of the same structure (abstract target ok)."""
        if step is None:
            step = self.best_step() if best else self.last_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        path = os.path.join(self.ckpt_dir, str(step))
        return self._ckptr.restore(path, target)

    def restore_tree(self, step: Optional[int] = None,
                     best: bool = False) -> Any:
        """Restore the RAW checkpoint pytree, no target required — for
        consumers that only need params/batch_stats (eval, export) and must
        not have to reconstruct the training-time optimizer to read a
        checkpoint (the reference loads weights the same way,
        pl_helpers.py:222 load_training strict=False)."""
        if step is None:
            step = self.best_step() if best else self.last_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        return self._ckptr.restore(os.path.join(self.ckpt_dir, str(step)))
