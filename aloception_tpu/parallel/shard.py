"""Sharding rules: batch over dp, large kernels over tp.

Replaces the reference's DistributedSampler+DDP pair: inputs carry a
NamedSharding over the mesh and ``jit`` inserts the all-reduces (gradients)
and all-gathers (tp activations) automatically — the scaling-book recipe
(mesh -> annotate -> let XLA insert collectives).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(batch: Any, mesh: Mesh, strict: bool = False) -> Any:
    """Place a host batch with its leading axis sharded over dp.

    Arrays whose leading dim is not divisible by the dp axis are replicated
    (with strict=True this raises instead) — lets small smoke batches run on
    big meshes at the cost of redundant compute.
    """
    dp = mesh.shape.get("dp", 1)

    def _put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % dp == 0:
            spec = P("dp", *([None] * (x.ndim - 1)))
        elif strict and getattr(x, "ndim", 0) >= 1:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by dp={dp}")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def param_partition_spec(path, x, tp: int) -> P:
    """Partition rule for model params under tensor parallelism.

    Heuristic tuned for the DETR/RAFT families: 2-D Dense kernels with a
    large, tp-divisible output dim shard that dim (column parallel); their
    biases follow. Everything else replicates. Conv kernels replicate (CV
    convs are small; the FLOPs live in the transformer).
    """
    if tp <= 1:
        return P()
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = names and names[-1] == "kernel"
    is_bias = names and names[-1] == "bias"
    if is_kernel and x.ndim == 2 and x.shape[-1] % tp == 0 and x.shape[-1] >= 512:
        return P(None, "tp")
    if is_bias and x.ndim == 1 and x.shape[0] % tp == 0 and x.shape[0] >= 512:
        return P("tp")
    return P()


def partition_params(params: Any, mesh: Mesh) -> Any:
    """device_put params with the tp partition rules over ``mesh``."""
    tp = mesh.shape.get("tp", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            x, NamedSharding(mesh, param_partition_spec(path, x, tp))),
        params)
