"""Multi-host helpers — the analog of the reference's rank utilities
(/root/reference/alonet/multi_gpu.py:5-33: get_world_size/get_rank/
is_main_rank), expressed over jax processes instead of torch.distributed."""

from __future__ import annotations

import functools

import jax


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    """rank-0 gate for logging/checkpoint IO (multi_gpu.py:25)."""
    return jax.process_index() == 0


def main_process_only(fn):
    """Decorator: run only on process 0 (the @rank_zero_only analog,
    detr/callbacks.py:12)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None
    return wrapper
