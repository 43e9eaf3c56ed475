"""Round-3 diagnostic: how much of Deformable-DETR e2e is the MSDA op vs
everything else, at bench shapes (bs16 640px bf16).

Three runs: full model (pallas MSDA), model with the core MSDA op stubbed to
a near-free tensor op (isolates op cost incl. its XLA prep), backbone alone.
Chained-timing methodology (DEVELOPMENT.md).
"""

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
    print(f"{label}: {dt * 1000:.1f} ms/batch", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.deformable_detr import DeformableDETR
    from aloception_tpu.models.backbone.resnet import Backbone
    import aloception_tpu.ops.ms_deform_attn as msda_mod

    B, S = 16, 640
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, S, S, 3), jnp.float32)
    mask = jnp.zeros((B, S, S), jnp.float32)

    def build_model():
        m = DeformableDETR(num_classes=91, msda_impl="pallas",
                           dtype=jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(0), images[:1], mask[:1])
        return m, params

    m, params = build_model()
    fwd = jax.jit(lambda x: x + m.apply(params, x, mask)[
        "pred_logits"].mean().astype(x.dtype) * 1e-9)
    timed(fwd, images, label="full pallas")

    # stub the core op: keep prep math shape-compatible, but replace the
    # sampling with a cheap mean over value rows (same output shape)
    real = msda_mod.ms_deform_attn

    def stub(value, shapes, loc, w, impl="pallas", **kw):
        Bv, Lv, nH, C = value.shape
        Lq = loc.shape[1]
        pooled = value.mean(axis=1).reshape(Bv, 1, nH * C)
        scale = (loc.sum(axis=(2, 3, 4, 5)) + w.sum(axis=(2, 3, 4)))[..., None]
        return pooled * (1.0 + scale * 1e-9)

    msda_mod.ms_deform_attn = stub
    try:
        import aloception_tpu.models.deformable_detr.ms_deform_attn as mm
        mm.ms_deform_attn = stub
        m2, params2 = build_model()
        fwd2 = jax.jit(lambda x: x + m2.apply(params2, x, mask)[
            "pred_logits"].mean().astype(x.dtype) * 1e-9)
        timed(fwd2, images, label="msda stubbed")
    finally:
        msda_mod.ms_deform_attn = real
        mm.ms_deform_attn = real

    bb = Backbone(return_layers=("layer2", "layer3", "layer4"),
                  space_to_depth=True, dtype=jnp.bfloat16)
    bparams = bb.init(jax.random.PRNGKey(0), images[:1], mask[:1])
    bfwd = jax.jit(lambda x: x + bb.apply(bparams, x, mask)[-1][0]
                   .mean().astype(x.dtype) * 1e-9)
    timed(bfwd, images, label="backbone only")


if __name__ == "__main__":
    main()
