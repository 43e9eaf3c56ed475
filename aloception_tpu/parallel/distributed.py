"""Multi-host helpers — the analog of the reference's rank utilities
(/root/reference/alonet/multi_gpu.py:5-33: get_world_size/get_rank/
is_main_rank), expressed over jax processes instead of torch.distributed."""

from __future__ import annotations

import functools
import os

import jax


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Bring up multi-host (DCN) JAX — the analog of the reference's
    Lightning DDP bring-up (/root/reference/alonet/common/pl_helpers.py:
    365-374, ``strategy="ddp"`` + NCCL init), expressed as
    ``jax.distributed.initialize``. After this returns, ``jax.devices()``
    spans every process's chips and a single ``make_mesh()`` covers the
    whole pod slice; XLA collectives ride ICI within a host and DCN across.

    Arguments default from the environment (the way launchers pass rank
    info, mirroring torchrun's MASTER_ADDR/RANK/WORLD_SIZE):

    - ``ALO_COORDINATOR_ADDRESS`` (host:port of process 0)
    - ``ALO_NUM_PROCESSES``
    - ``ALO_PROCESS_ID``

    On Cloud TPU pod slices all three may be absent — then
    ``jax.distributed.initialize()`` is called with no arguments and
    auto-detects from the TPU metadata server. Returns True if an
    initialize call was made, False if skipped (single-process run with no
    coordinator configured, or already initialized).
    """
    env = os.environ
    coordinator_address = (coordinator_address
                           or env.get("ALO_COORDINATOR_ADDRESS"))
    if num_processes is None and env.get("ALO_NUM_PROCESSES"):
        num_processes = int(env["ALO_NUM_PROCESSES"])
    if process_id is None and env.get("ALO_PROCESS_ID"):
        process_id = int(env["ALO_PROCESS_ID"])

    # Already initialized (jax.distributed.initialize raises on re-init).
    client = getattr(jax._src.distributed, "global_state", None)
    if client is not None and getattr(client, "client", None) is not None:
        return False

    if coordinator_address is not None:
        if num_processes is None or process_id is None:
            raise ValueError(
                "init_multihost: ALO_COORDINATOR_ADDRESS set but "
                "ALO_NUM_PROCESSES / ALO_PROCESS_ID missing")
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if env.get("TPU_WORKER_HOSTNAMES") or env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        # TPU pod slice: zero-arg auto-detect from the metadata server.
        jax.distributed.initialize()
        return True
    return False


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
