"""A/B the corr-lookup variants on TPU with a STRONG data-dependent chain:
coords_{n+1} = coords_n + 1e-3 * out[..., :2], so no call can be deduped or
constant-folded (the `x + 1e-9*mean` chain underflows to x exactly in f32 and
the tunneled backend then serves cached results — measured 0.00 ms/call)."""

import time
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.correlation import (
        corr_volume, corr_pyramid, corr_lookup, corr_lookup_block,
        corr_lookup_onehot)

    B, H, W = (int(sys.argv[1]) if len(sys.argv) > 1 else 2), 368, 496
    H8, W8 = H // 8, W // 8
    rng = np.random.RandomState(0)
    m1 = jnp.asarray(rng.randn(B, H8, W8, 256), jnp.float32)
    m2 = jnp.asarray(rng.randn(B, H8, W8, 256), jnp.float32)
    pyr = [jnp.asarray(p) for p in corr_pyramid(corr_volume(m1, m2), 4)]
    from aloception_tpu.ops.warp import coords_grid
    c0 = jnp.broadcast_to(coords_grid(H8, W8)[None], (B, H8, W8, 2)) \
        + jnp.asarray(rng.randn(B, H8, W8, 2), jnp.float32)

    def fetch(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    for name, fn in (("block", corr_lookup_block), ("elem", corr_lookup),
                     ("onehot", corr_lookup_onehot)):
        @jax.jit
        def chained(c, fn=fn):
            out = fn(pyr, c, radius=4)
            # strong dependence; tanh keeps coords bounded in-range
            return c + jnp.tanh(out[..., :2]) * 0.5

        fetch(chained(c0))

        def run(n):
            c = c0
            t0 = time.perf_counter()
            for _ in range(n):
                c = chained(c)
            fetch(c)
            return time.perf_counter() - t0

        run(2)
        iters = 8
        t1 = run(iters)
        t2 = run(2 * iters)
        dt = max(t2 - t1, 1e-9) / iters
        print(f"corr_lookup[{name}] B={B}: {dt * 1000:.2f} ms/call",
              flush=True)


if __name__ == "__main__":
    main()
