"""TPU parity vs CPU-computed lax oracle at production dims."""
import numpy as np, jax, jax.numpy as jnp
from aloception_tpu.ops.ms_deform_attn import ms_deform_attn, ms_deform_attn_lax

C, P = 32, 4
shapes = ((80,80),(40,40),(20,20),(10,10)); L = len(shapes)
Len_v = sum(h*w for h,w in shapes)
rng = np.random.RandomState(0)
B, nH, Lq = 2, 8, 300
value = rng.randn(B, Len_v, nH, C).astype(np.float32)
loc = rng.rand(B, Lq, nH, L, P, 2).astype(np.float32)
w = rng.rand(B, Lq, nH, L, P).astype(np.float32)

cpu = jax.devices('cpu')[0]
with jax.default_device(cpu):
    ref = np.asarray(ms_deform_attn_lax(jnp.asarray(value), shapes,
                                        jnp.asarray(loc), jnp.asarray(w)))
for impl in ('pallas', 'block', 'fast', 'lax'):
    o = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                  jnp.asarray(loc), jnp.asarray(w), impl=impl))
    print(f'{impl:7s} TPU vs CPU-lax: {np.abs(o - ref).max():.6f}', flush=True)

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
    print(f'grad {name}: maxdiff {np.abs(a-b).max():.5f} scale {np.abs(b).max():.2f}', flush=True)
