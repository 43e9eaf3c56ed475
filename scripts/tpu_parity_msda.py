"""TPU parity vs CPU-computed lax oracle at production dims.

Exit code 0 iff every implementation matches the oracle (fwd abs diff
<= 1e-4 on O(1) values; grad rel diff <= 1e-4). bench.py runs this as a
GATE before recording any perf number — the round-2 backend-miscompile
episode (DEVELOPMENT.md) proved a wrong-but-fast kernel would otherwise
produce a green BENCH file.
"""
import os
import sys

# Bootstrap: a bare ``python scripts/tpu_parity_msda.py`` puts scripts/ at
# sys.path[0], not the repo root — the exact ModuleNotFoundError that nulled
# BENCH_r04. bench.py's gate also sets PYTHONPATH (belt), this is braces.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


FWD_TOL = 1e-4      # abs, inputs are O(1) randn
GRAD_REL_TOL = 1e-4  # maxdiff / grad scale


def run(verbose: bool = True, smoke: bool = False) -> bool:
    import jax

    if smoke:
        # sitecustomize pre-imports jax, so JAX_PLATFORMS env is captured
        # too late (tests/conftest.py) — force CPU via config instead.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from aloception_tpu.ops.ms_deform_attn import (ms_deform_attn,
                                                   ms_deform_attn_lax)

    if smoke:
        # tiny dims: exercises the exact subprocess/import/dispatch path on
        # CPU in seconds (tests/test_bench_gate.py) — the BENCH_r04 failure
        # mode was a ModuleNotFoundError, not a numerics miss.
        C, P = 8, 2
        shapes = ((8, 8), (4, 4))
        B, nH, Lq = 1, 2, 16
    else:
        C, P = 32, 4
        shapes = ((80, 80), (40, 40), (20, 20), (10, 10))
        B, nH, Lq = 2, 8, 300
    L = len(shapes)
    Len_v = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(0)
    value = rng.randn(B, Len_v, nH, C).astype(np.float32)
    loc = rng.rand(B, Lq, nH, L, P, 2).astype(np.float32)
    w = rng.rand(B, Lq, nH, L, P).astype(np.float32)

    ok = True
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        ref = np.asarray(ms_deform_attn_lax(jnp.asarray(value), shapes,
                                            jnp.asarray(loc), jnp.asarray(w)))
    for impl in ('pallas', 'block', 'fast', 'lax'):
        o = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                      jnp.asarray(loc), jnp.asarray(w),
                                      impl=impl))
        d = np.abs(o - ref).max()
        ok &= bool(d <= FWD_TOL)
        if verbose:
            print(f'{impl:7s} TPU vs CPU-lax: {d:.6f}'
                  f'{"" if d <= FWD_TOL else "  <-- FAIL"}', flush=True)

    # gradient parity too (pallas custom VJP on TPU vs CPU lax autodiff)
    def loss(fn, v, l, a):
        return jnp.sum(fn(v, shapes, l, a) ** 2)

    g_pal = jax.grad(lambda v, l, a: loss(
        lambda *x: ms_deform_attn(*x[:1], x[1], *x[2:], impl='pallas'),
        v, l, a), argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    with jax.default_device(cpu):
        g_ref = jax.grad(lambda v, l, a: loss(ms_deform_attn_lax, v, l, a),
                         argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for name, a, b in zip(('dvalue', 'dloc', 'dw'), g_pal, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        rel = np.abs(a - b).max() / scale
        ok &= bool(rel <= GRAD_REL_TOL)
        if verbose:
            print(f'grad {name}: maxdiff {np.abs(a - b).max():.5f} '
                  f'scale {scale:.2f} rel {rel:.2e}'
                  f'{"" if rel <= GRAD_REL_TOL else "  <-- FAIL"}',
                  flush=True)

    if verbose:
        print(f'MSDA parity: {"OK" if ok else "FAIL"}', flush=True)
    return ok


if __name__ == "__main__":
    sys.exit(0 if run(smoke="--smoke" in sys.argv[1:]) else 1)
