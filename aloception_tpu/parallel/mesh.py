"""Device meshes — the framework's parallelism substrate.

The reference's distributed story is Lightning DDP over NCCL
(/root/reference/alonet/common/pl_helpers.py:372); the TPU-native equivalent
is a ``jax.sharding.Mesh`` over the chips with XLA collectives riding ICI.
Axes:

- ``dp``  — data parallel (batch sharded; gradients all-reduced by XLA)
- ``tp``  — tensor parallel (large Dense kernels sharded; activations
            resharded by XLA collectives)

Multi-host (DCN) comes for free from jax.distributed initialization: the same
mesh spans all processes' devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def default_mesh_shape(n_devices: Optional[int] = None,
                       tp: Optional[int] = None) -> Tuple[int, int]:
    """Pick (dp, tp). CV models are small: default is pure DP (tp=1); pass
    tp>1 to shard the transformer FFN/attention weights."""
    n = n_devices if n_devices is not None else len(jax.devices())
    tp = tp or 1
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return (n // tp, tp)


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, tp_ = default_mesh_shape(len(devices), tp)
    dev_array = np.asarray(devices).reshape(dp, tp_)
    return Mesh(dev_array, axis_names=("dp", "tp"))
