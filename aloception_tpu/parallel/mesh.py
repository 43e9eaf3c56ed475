"""Device meshes — the framework's parallelism substrate.

The reference's distributed story is Lightning DDP over NCCL
(/root/reference/alonet/common/pl_helpers.py:372); the TPU-native equivalent
is a ``jax.sharding.Mesh`` over the chips with XLA collectives riding ICI.
Axes:

- ``dp``  — data parallel (batch sharded; gradients all-reduced by XLA)
- ``sp``  — sequence parallel (encoder token axis sharded via
            with_sharding_constraint hooks in the models; XLA all-gathers
            around attention and keeps LayerNorm/FFN work sharded —
            Megatron-SP from annotations alone)
- ``tp``  — tensor parallel (large Dense kernels sharded; activations
            resharded by XLA collectives)
- ``pp``  — pipeline parallel (stacked layer params sharded per stage;
            activations hop stages via lax.ppermute — parallel/pipeline.py)

Multi-host (DCN): call ``parallel.init_multihost()`` (distributed.py) —
or pass ``--multihost`` to the train CLIs — before building the mesh; after
``jax.distributed.initialize`` the same mesh spans all processes' devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def default_mesh_shape(n_devices: Optional[int] = None,
                       tp: Optional[int] = None,
                       sp: Optional[int] = None,
                       pp: Optional[int] = None
                       ) -> Tuple[int, int, int, int]:
    """Pick (dp, pp, sp, tp). CV models are small: default is pure DP
    (pp=sp=tp=1); pass tp>1 to shard the transformer FFN/attention weights,
    sp>1 to shard encoder tokens, pp>1 to pipeline layer stacks."""
    n = n_devices if n_devices is not None else len(jax.devices())
    tp = tp or 1
    sp = sp or 1
    pp = pp or 1
    assert n % (tp * sp * pp) == 0, \
        f"{n} devices not divisible by pp={pp} * sp={sp} * tp={tp}"
    return (n // (tp * sp * pp), pp, sp, tp)


def make_mesh(n_devices: Optional[int] = None, tp: Optional[int] = None,
              sp: Optional[int] = None, pp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """4-axis ("dp", "pp", "sp", "tp") mesh; unused axes have size 1
    (specs that don't name them are unaffected)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    dp, pp_, sp_, tp_ = default_mesh_shape(len(devices), tp, sp, pp)
    dev_array = np.asarray(devices).reshape(dp, pp_, sp_, tp_)
    return Mesh(dev_array, axis_names=("dp", "pp", "sp", "tp"))
