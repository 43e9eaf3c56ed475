"""Depth evaluation metrics (reference: alonet/metrics/depth_metrics.py:9):
RMSE, RMSE(log), abs-rel, sq-rel and delta-threshold accuracies."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class DepthMetrics:

    def __init__(self, min_depth: float = 1e-3, max_depth: float = 80.0):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self._sums: Dict[str, float] = {}
        self._n = 0

    def add_sample(self, p_depth, t_depth, mask: Optional[np.ndarray] = None):
        """p_depth/t_depth: aloscene.Depth or ndarray (depth_metrics.py:68)."""
        p = np.asarray(p_depth.as_numpy() if hasattr(p_depth, "as_numpy")
                       else p_depth, np.float64).reshape(-1)
        t = np.asarray(t_depth.as_numpy() if hasattr(t_depth, "as_numpy")
                       else t_depth, np.float64).reshape(-1)
        valid = (t > self.min_depth) & (t < self.max_depth) \
            & np.isfinite(p) & np.isfinite(t)
        if mask is not None:
            valid &= np.asarray(mask).reshape(-1) > 0.5
        if valid.sum() == 0:
            return
        p = np.clip(p[valid], self.min_depth, self.max_depth)
        t = t[valid]

        thresh = np.maximum(t / p, p / t)
        metrics = {
            "a1": float((thresh < 1.25).mean()),
            "a2": float((thresh < 1.25 ** 2).mean()),
            "a3": float((thresh < 1.25 ** 3).mean()),
            "rmse": float(np.sqrt(((t - p) ** 2).mean())),
            "rmse_log": float(np.sqrt(((np.log(t) - np.log(p)) ** 2).mean())),
            "abs_rel": float((np.abs(t - p) / t).mean()),
            "sq_rel": float((((t - p) ** 2) / t).mean()),
        }
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + v
        self._n += 1

    def __len__(self):
        return self._n

    def calc_map(self, print_result: bool = False) -> Dict[str, float]:
        """(depth_metrics.py:163)"""
        out = {k: v / max(self._n, 1) for k, v in self._sums.items()}
        if print_result:
            print(" | ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out
