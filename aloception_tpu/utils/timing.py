"""Honest TPU timing through the axon tunnel.

block_until_ready() returns before device execution on this backend and
identical repeated calls can be deduped — the only trustworthy pattern is a
data-dependent chain inside one jit with a single host fetch at the end
(see .claude/skills/verify/SKILL.md "TPU timing").
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def chained_time(fn: Callable, inputs: Tuple, iters: int = 20,
                 warmup: int = 2) -> float:
    """Seconds per call of fn(*inputs), measured as a data-dependent chain.

    The first input must be a float array; a tiny perturbation derived from
    the output is folded into it every iteration so no caching/overlap can
    fake the timing.
    """
    @partial(jax.jit, static_argnums=())
    def chain(first, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            leaf = jax.tree.leaves(out)[0]
            carry = carry + (jnp.sum(leaf.astype(jnp.float32))
                             * 1e-12).astype(carry.dtype)
            return carry, ()
        carry, _ = jax.lax.scan(body, first, None, length=iters)
        return carry

    first, *rest = inputs
    out = chain(first, *rest)
    float(jnp.sum(out))  # compile + warmup fetch
    for _ in range(warmup):
        out = chain(first, *rest)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = chain(first, *rest)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters
