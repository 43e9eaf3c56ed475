"""RAFT component timing on TPU at 368x496 (bench shape): where do the
353 ms/pair go? Times the full model at iters in {0-ish, 1, 6, 12} plus the
lookup and update block in isolation; per-iteration cost falls out of the
differences. Tunnel-safe pattern (unrolled data-dependent chain, difference
timing)."""

import time

import numpy as np


def timed(fn, x0, iters=6, label=""):
    import jax.numpy as jnp

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    fetch(fn(x0))

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(x)
        fetch(x)
        return time.perf_counter() - t0

    run(2)
    t1 = run(iters)
    t2 = run(2 * iters)
    dt = max(t2 - t1, 1e-9) / iters
    print(f"{label}: {dt * 1000:.2f} ms/call", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.raft import RAFT
    from aloception_tpu.models.raft.extractor import BasicEncoder
    from aloception_tpu.ops.correlation import (corr_volume, corr_pyramid,
                                                corr_lookup_block,
                                                corr_lookup_onehot,
                                                corr_lookup)
    from aloception_tpu.ops.warp import coords_grid

    B, H, W = 2, 368, 496
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    model = RAFT(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), f1[:1], f2[:1], iters=1)

    for iters in (1, 6, 12):
        def full(x, it=iters):
            flow = model.apply(variables, x, f2, iters=it, only_last=True)
            return x + (jnp.sum(flow.astype(jnp.float32)) * 1e-9).astype(
                x.dtype)
        timed(jax.jit(full), f1, label=f"RAFT full iters={iters}")

    # encoders + volume + pyramid only
    enc = BasicEncoder(output_dim=256, norm_fn="instance", dtype=jnp.bfloat16)
    ev = {"params": variables["params"]["fnet"]}

    def encoders(x):
        m1 = enc.apply(ev, x).astype(jnp.float32)
        m2 = enc.apply(ev, f2).astype(jnp.float32)
        pyr = corr_pyramid(corr_volume(m1, m2), num_levels=4)
        return x + (jnp.sum(pyr[0]) * 1e-12).astype(x.dtype)
    timed(jax.jit(encoders), f1, label="fnet x2 + volume + pyramid")

    # lookup alone, at level-0 resolution
    H8, W8 = H // 8, W // 8
    m1 = jnp.asarray(rng.randn(B, H8, W8, 256), jnp.float32)
    m2 = jnp.asarray(rng.randn(B, H8, W8, 256), jnp.float32)
    pyr = [jnp.asarray(p) for p in corr_pyramid(corr_volume(m1, m2), 4)]
    c0 = jnp.broadcast_to(coords_grid(H8, W8)[None], (B, H8, W8, 2))

    for name, fn in (("block", corr_lookup_block), ("elem", corr_lookup),
                     ("onehot", corr_lookup_onehot)):
        def look(x, fn=fn):
            out = fn(pyr, x, radius=4)
            return x + (jnp.mean(out) * 1e-9).astype(x.dtype) \
                * jnp.ones_like(x)
        timed(jax.jit(look), c0, label=f"corr_lookup[{name}] x1")


if __name__ == "__main__":
    main()
