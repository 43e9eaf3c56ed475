"""RAFT corr-pyramid: fused Pallas kernel vs XLA matmul path on hardware.

VERDICT r3 #3b: `corr_volume_pyramid_pallas` (ops/pallas/corr_kernel.py) was
interpret-tested only. This script, on the real chip:
  1. parity: pyramid outputs vs corr_pyramid(corr_volume(...)) at Sintel-
     eval dims (368x768 -> 1/8 = 46x96) and the bench dims
  2. timing: both paths, compile excluded, host-fetch synchronized
     (block_until_ready does not sync through the axon tunnel)

Reference analog: alonet/raft/corr.py:63-92 AlternateCorrBlock (the
memory-saving on-the-fly variant).
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from aloception_tpu.ops.correlation import corr_volume, corr_pyramid
from aloception_tpu.ops.pallas.corr_kernel import corr_volume_pyramid_pallas


def fetch(x):
    return float(jnp.sum(jnp.stack([jnp.sum(o.astype(jnp.float32)) for o in x])))


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    fetch(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = fetch(out)
    return (time.perf_counter() - t0) / iters * 1e3, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=46)
    ap.add_argument("--w", type=int, default=96)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--levels", type=int, default=4)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(args.b, args.h, args.w, args.c), jnp.float32)
    f2 = jnp.asarray(rng.randn(args.b, args.h, args.w, args.c), jnp.float32)

    xla = jax.jit(lambda a, b: corr_pyramid(corr_volume(a, b),
                                            num_levels=args.levels))
    plk = jax.jit(lambda a, b: corr_volume_pyramid_pallas(
        a, b, num_levels=args.levels))
    plk_bf16 = jax.jit(lambda a, b: corr_volume_pyramid_pallas(
        a, b, num_levels=args.levels, compute_dtype=jnp.bfloat16))

    ref = xla(f1, f2)
    got = plk(f1, f2)
    errs = [float(jnp.abs(r - g).max()) for r, g in zip(ref, got)]
    print(f"parity f32 max_abs per level: {errs}")
    assert max(errs) < 1e-3, f"PARITY FAIL: {errs}"
    got16 = plk_bf16(f1, f2)
    errs16 = [float(jnp.abs(r - g).max()) for r, g in zip(ref, got16)]
    print(f"parity bf16 max_abs per level: {errs16}")

    t_xla, s1 = time_fn(xla, f1, f2)
    t_pl, s2 = time_fn(plk, f1, f2)
    t_pl16, s3 = time_fn(plk_bf16, f1, f2)
    print(f"B={args.b} {args.h}x{args.w}x{args.c} L={args.levels}")
    print(f"  xla_matmul_pyramid: {t_xla:.3f} ms (sum {s1:.1f})")
    print(f"  pallas_fused_f32  : {t_pl:.3f} ms (sum {s2:.1f})")
    print(f"  pallas_fused_bf16 : {t_pl16:.3f} ms (sum {s3:.1f})")
    print(f"  winner: {'pallas' if min(t_pl, t_pl16) < t_xla else 'xla'}")


if __name__ == "__main__":
    main()
