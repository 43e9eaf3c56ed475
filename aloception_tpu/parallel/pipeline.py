"""GPipe-style pipeline parallelism over the mesh's ``pp`` axis.

The reference scales only by data parallelism (DDP,
alonet/common/pl_helpers.py); on TPU pods the deep homogeneous stacks
(DETR's 6+6 transformer layers) can additionally be split across chips as
pipeline stages. This is the idiomatic JAX formulation: the per-layer
parameters are STACKED on a leading layer axis and sharded over ``pp``
(each chip holds ``n_layers / pp`` consecutive layers); inside a
``shard_map`` every chip runs the same program (SPMD) and activations hop
stage-to-stage with ``lax.ppermute`` over ICI, one microbatch per tick —
the GPipe schedule with its (S-1)/(M+S-1) bubble. Autodiff runs straight
through (``ppermute``'s transpose is the reverse permute), so the same
function trains.

No NCCL/MPI analog anywhere: the mesh + ppermute IS the pipeline fabric.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(params_list: Sequence[Any]) -> Any:
    """Stack N structurally-identical per-layer pytrees on a new leading
    layer axis (the axis ``gpipe`` shards over ``pp``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def extract_layer_stack(params: Any, prefix: str, n_layers: int) -> Any:
    """Pull ``{prefix}0 .. {prefix}{n-1}`` subtrees out of a flax param dict
    (e.g. the Transformer's ``encoder_layer{i}``) and stack them."""
    inner = params["params"] if "params" in params else params
    return stack_layer_params([inner[f"{prefix}{i}"] for i in range(n_layers)])


def gpipe(layer_apply: Callable, stacked_params: Any, x: jnp.ndarray,
          extras: Any, mesh: Mesh, n_micro: int, axis: str = "pp"):
    """Run a homogeneous layer stack as a pipeline over ``mesh[axis]``.

    layer_apply(p_layer, act, extras) -> act: ONE layer's forward; ``act``
        keeps a constant shape across layers ((B_micro, L, C) for a
        transformer stack).
    stacked_params: per-layer params stacked on axis 0 (``n_layers`` total,
        divisible by the pipeline size; sharded P(axis) so each chip holds
        its stage's contiguous slice).
    x: (B, ...) input activations, sharded over ``dp`` and microbatched
        locally into ``n_micro`` chunks (B / dp must be divisible).
    extras: pytree of (B, ...) side inputs every layer consumes (positional
        embeddings, padding masks); microbatched in lockstep with ``x`` and
        replicated over ``pp`` so stage s can read microbatch t - s.

    Returns the stack output, (B, ...), replicated over ``pp`` (the last
    stage's results are broadcast with a masked psum so downstream SPMD
    code continues uniformly).
    """
    S = mesh.shape[axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % S:
        raise ValueError(f"{n_layers} layers not divisible by {axis}={S}")

    def _microbatch(a):
        if a.shape[0] % n_micro:
            raise ValueError(
                f"local batch {a.shape[0]} not divisible by "
                f"n_micro={n_micro}")
        return a.reshape(n_micro, a.shape[0] // n_micro, *a.shape[1:])

    def _run(local_params, xb, exb):
        stage = jax.lax.axis_index(axis)
        micro_x = _microbatch(xb)
        micro_ex = jax.tree.map(_microbatch, exb)

        def local_stage(act, ex):
            def body(a, p):
                return layer_apply(p, a, ex), None
            out, _ = jax.lax.scan(body, act, local_params)
            return out

        def tick(act_in, t):
            # stage 0 injects microbatch t; older stages work on what
            # ppermute delivered last tick (microbatch t - stage)
            inj = jax.lax.dynamic_index_in_dim(
                micro_x, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            act = jnp.where(stage == 0, inj, act_in)
            m_here = jnp.clip(t - stage, 0, n_micro - 1)
            ex = jax.tree.map(
                lambda e: jax.lax.dynamic_index_in_dim(
                    e, m_here, 0, keepdims=False), micro_ex)
            out = local_stage(act, ex)
            nxt = jax.lax.ppermute(
                out, axis, [(i, i + 1) for i in range(S - 1)])
            return nxt, out

        T = n_micro + S - 1
        zero = jnp.zeros_like(micro_x[0])
        _, outs = jax.lax.scan(tick, zero, jnp.arange(T))
        # microbatch m leaves the last stage at tick m + S - 1. Broadcast
        # the last stage's rows with where+psum — NOT ys * mask: non-final
        # stages compute on zero bootstrap activations during warmup ticks,
        # and a layer that emits NaN/inf on zeros (0/0 norms, log, 1/x)
        # would poison every chip through NaN * 0.0 = NaN.
        ys = outs[S - 1:]                                # (n_micro, mB, ...)
        ys = jnp.where(stage == S - 1, ys, jnp.zeros_like(ys))
        ys = jax.lax.psum(ys, axis)                      # broadcast over pp
        return ys.reshape(xb.shape)

    spec_x = P("dp", *([None] * (x.ndim - 1)))
    spec_ex = jax.tree.map(
        lambda e: P("dp", *([None] * (e.ndim - 1))), extras)
    try:
        run = shard_map(_run, mesh=mesh,
                        in_specs=(P(axis), spec_x, spec_ex),
                        out_specs=spec_x, check_vma=False)
    except TypeError:  # pre-0.8 shard_map spelling
        run = shard_map(_run, mesh=mesh,
                        in_specs=(P(axis), spec_x, spec_ex),
                        out_specs=spec_x, check_rep=False)
    return run(stacked_params, x, extras)


def shard_layer_stack(stacked_params: Any, mesh: Mesh,
                      axis: str = "pp") -> Any:
    """Place a stacked layer tree with its leading (layer) axis sharded
    over the pipeline axis — each chip materializes only its own stage."""
    def _put(p):
        return jax.device_put(
            p, NamedSharding(mesh, P(axis, *([None] * (p.ndim - 1)))))
    return jax.tree.map(_put, stacked_params)
