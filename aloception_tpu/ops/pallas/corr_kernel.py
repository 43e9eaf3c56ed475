"""Fused correlation-volume + pyramid Pallas kernel (RAFT hot path).

Replaces ``corr_pyramid(corr_volume(f1, f2))`` (ops/correlation.py; reference
semantics alonet/raft/corr.py:18-27).

Key identity: average-pooling the volume over target windows commutes with
the dot product —  mean_{p in win(j)} f1(n)·f2(p)  =  f1(n) · meanpool(f2)(j).
So every pyramid level is its own MXU matmul against a *pooled feature map*
(pooled once, tiny) instead of a pooled 200 MB volume. The kernel keeps all
pooled f2 levels resident in VMEM and, per tile of query rows, runs one
matmul per level — the volume is written once per level and never re-read.

Mosaic constraints honored: only 2-D refs and dots inside the kernel (the
5-D pooling reshape that a naive port needs is unsupported, and unnecessary).

Memory plan per grid cell (Sintel 1/8: N=7040, C=256, f32): f2 levels
~9.6 MB + f1 tile 0.13 MB + out tiles ~4.8 MB => ~14.5 MB < 16 MB VMEM.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_fmap(f, Hl: int, Wl: int):
    """(B, Hl, Wl, C) -> (B, Hl//2, Wl//2, C) 2x2 mean (floor), in XLA."""
    H2, W2 = Hl // 2, Wl // 2
    f = f[:, :H2 * 2, :W2 * 2]
    return f.reshape(f.shape[0], H2, 2, W2, 2, f.shape[-1]).mean(axis=(2, 4))


def _kernel(f1_ref, *refs, num_levels: int):
    f2_refs = refs[:num_levels]
    out_refs = refs[num_levels:]
    scale = 1.0 / (f1_ref.shape[1] ** 0.5)
    f1 = f1_ref[:]
    for lvl in range(num_levels):
        corr = jnp.dot(f1, f2_refs[lvl][:].T,
                       preferred_element_type=jnp.float32)
        out_refs[lvl][:] = corr * scale


@functools.partial(jax.jit,
                   static_argnames=("num_levels", "interpret", "compute_dtype"))
def corr_volume_pyramid_pallas(fmap1, fmap2, num_levels: int = 4,
                               interpret: bool = False,
                               compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """fmap1/fmap2: (B, H, W, C) -> [ (B, H*W, H_l, W_l) ] per level,
    matching corr_pyramid(corr_volume(...)) exactly (f32 accumulate;
    compute_dtype=bfloat16 runs the matmuls at the MXU's 4x bf16 rate)."""
    B, H, W, C = fmap1.shape
    N = H * W
    TILE = 128 if N % 128 == 0 else (64 if N % 64 == 0 else 8)
    assert N % TILE == 0, f"H*W={N} must tile by 8"

    level_hw: List[Tuple[int, int]] = [(H, W)]
    f2_levels = [fmap2.astype(jnp.float32)]
    for _ in range(num_levels - 1):
        Hl, Wl = level_hw[-1]
        f2_levels.append(_pool_fmap(f2_levels[-1], Hl, Wl))
        level_hw.append((Hl // 2, Wl // 2))

    out_shapes = [jax.ShapeDtypeStruct((N, h * w), jnp.float32)
                  for (h, w) in level_hw]
    in_specs = [pl.BlockSpec((TILE, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]  # dtype per caller
    for (h, w) in level_hw:
        in_specs.append(pl.BlockSpec((h * w, C), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((TILE, h * w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
                 for (h, w) in level_hw]

    def run(f1_2d, *f2_2ds):
        return pl.pallas_call(
            functools.partial(_kernel, num_levels=num_levels),
            grid=(N // TILE,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(f1_2d, *f2_2ds)

    f1 = fmap1.reshape(B, N, C).astype(compute_dtype)
    f2s = [f.reshape(B, -1, C).astype(compute_dtype) for f in f2_levels]
    outs = jax.vmap(run)(f1, *f2s)
    return [o.reshape(B, N, h, w) for o, (h, w) in zip(outs, level_hw)]
