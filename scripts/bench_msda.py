"""TPU timing: ms_deform_attn lax vs fast vs pallas at Deformable-DETR's
real shapes (640px: levels 80,40,20,10; encoder Lq=Len_v=8500, decoder
Lq=300). Emits the timing table for docs/DEVELOPMENT.md."""

import time

import numpy as np


def timed(fn, x0, iters=8, label=""):
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
    print(f"{label}: {dt * 1000:.3f} ms/call", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import ms_deform_attn

    B, nH, C, P = 8, 8, 32, 4
    shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
    Len_v = sum(h * w for h, w in shapes)
    L = len(shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, Len_v, nH, C), jnp.float32)

    for site, Lq in (("decoder", 300), ("encoder", Len_v)):
        loc = jnp.asarray(rng.rand(B, Lq, nH, L, P, 2), jnp.float32)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(B, Lq, nH, L, P), jnp.float32)
            .reshape(B, Lq, nH, -1), -1).reshape(B, Lq, nH, L, P)
        for impl in ("block", "pallas", "fast", "lax"):
            if impl in ("lax", "fast") and site == "encoder":
                continue  # fast already measured at 463 ms; lax worse
            fn = jax.jit(lambda v, i=impl, l=loc, a=w: (
                ms_deform_attn(v, shapes, l, a, impl=i)
                .sum(axis=(1, 2), keepdims=False)[:, None, None, None]
                * 1e-9 + v))
            try:
                timed(fn, value, label=f"{site} Lq={Lq} impl={impl}")
            except Exception as e:
                print(f"{site} impl={impl} FAILED: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
