"""RAFT inference floor experiment (round 5): is the only_last path paying
for 12 upsamples where 1 is needed?

The shipped scan body (models/raft/raft.py body()) computes the mask head +
convex_upsample and emits a FULL-RES (B, H, W, 2) flow every iteration, even
under only_last=True where just the final one is consumed (the reference has
the same shape: raft.py:182-193 appends flow_up per iteration because
training's sequence loss needs all of them — inference does not).

Variants, all reusing the SHIPPED module params functionally (no product
code change; same ops, same order):

  shipped   model.apply(..., only_last=True) as bench.py times it
  lastup    lax.scan(iters-1) WITHOUT mask head / upsample / per-iter
            emission + ONE final update-block call with mask + ONE
            convex_upsample.  Output is mathematically identical to
            shipped (the mask head never feeds the carry).
  lastup16  lastup + the corr pyramid cast to bf16 so the one-hot lookup
            einsums run single-pass MXU bf16 instead of f32-HIGHEST
            (6-pass).  The lookup OUTPUT is cast to bf16 for the update
            block anyway, so the only numeric change is where the
            rounding happens; measured rel diff on the final flow is
            recorded.

Pre-committed decision rule (e2e decides, as every kernel before it):
  - ship the lastup restructuring if it wins >= 5% e2e AND matches the
    shipped TPU output to rel <= 1e-4 (it should be ~exact);
  - additionally tie the pyramid dtype to the model dtype (lastup16) only
    if it adds >= 8% on top AND the flow rel diff stays <= 2e-2 (bf16
    rounding scale), recording the numeric delta in DEVELOPMENT.md;
  - otherwise the kernel/model stays unchanged and the negative result is
    recorded.

Run on the real chip (one TPU job at a time, tunnel-safe difference
timing — see memory: block_until_ready does not sync through axon).
"""

import sys
import time

import numpy as np

# --f32 runs the parity anchor only, with the whole model in f32: confirms
# the lastup restructure is exact math (any bf16-run residual is then
# attributable to XLA rescheduling the final step outside the scan).
F32_MODE = "--f32" in sys.argv


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
    print(f"{label}: {dt * 1000:.2f} ms/call", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.raft import RAFT
    from aloception_tpu.models.raft.raft import convex_upsample
    from aloception_tpu.models.raft.extractor import BasicEncoder
    from aloception_tpu.models.raft.update import BasicUpdateBlock
    from aloception_tpu.ops.correlation import (corr_volume, corr_pyramid,
                                                corr_lookup_onehot)
    from aloception_tpu.ops.warp import coords_grid

    MDT = jnp.float32 if F32_MODE else jnp.bfloat16
    B, H, W = 2, 368, 496
    ITERS = 12
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    model = RAFT(dtype=MDT)
    variables = model.init(jax.random.PRNGKey(0), f1[:1], f2[:1], iters=1)
    params = variables["params"]
    # cnet carries BatchNorm running stats; fnet is instance-norm only
    cnet_vars = {"params": params["cnet"]}
    if "batch_stats" in variables:
        cnet_vars["batch_stats"] = variables["batch_stats"]["cnet"]

    fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                        dtype=MDT)
    cnet = BasicEncoder(output_dim=256, norm_fn="batch", dtype=MDT)
    hdim = cdim = 128
    corr_ch = 4 * 9 ** 2
    update = BasicUpdateBlock(corr_channels=corr_ch, hidden_dim=hdim,
                              dtype=MDT)
    upd_vars = {"params": params["update_block"]}

    def mirror(frame1, frame2, pyramid_dtype):
        """Functional mirror of RAFTBase.__call__ with the final-only
        mask/upsample restructuring (variant lastup / lastup16)."""
        fmap1 = fnet.apply({"params": params["fnet"]}, frame1).astype(
            jnp.float32)
        fmap2 = fnet.apply({"params": params["fnet"]}, frame2).astype(
            jnp.float32)
        c = cnet.apply(cnet_vars, frame1)
        net = jnp.tanh(c[..., :hdim]).astype(jnp.float32)
        inp = jax.nn.relu(c[..., hdim:]).astype(jnp.float32)
        pyramid = corr_pyramid(corr_volume(fmap1, fmap2), num_levels=4)
        pyramid = [p.astype(pyramid_dtype) for p in pyramid]
        Bc, H8, W8, _ = fmap1.shape
        coords0 = jnp.broadcast_to(coords_grid(H8, W8)[None],
                                   (Bc, H8, W8, 2))
        coords1 = coords0

        def step(net, coords1):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_lookup_onehot(pyramid, coords1, radius=4)
            flow = coords1 - coords0
            net, mask, delta = update.apply(
                upd_vars, net, inp, corr.astype(MDT),
                flow.astype(MDT))
            return net, coords1 + delta.astype(jnp.float32), mask

        def body(carry, _):
            net, coords1 = carry
            net, coords1, _ = step(net, coords1)
            return (net, coords1), None

        (net, coords1), _ = jax.lax.scan(body, (net, coords1), None,
                                         length=ITERS - 1)
        net, coords1, mask = step(net, coords1)   # final iter, with mask
        return convex_upsample(coords1 - coords0,
                               mask.astype(jnp.float32))

    # ---- parity anchors (TPU vs TPU; the restructure is exact math) ----
    shipped_flow = model.apply(variables, f1, f2, iters=ITERS,
                               only_last=True)
    variants = ((("lastup", jnp.float32),) if F32_MODE else
                (("lastup", jnp.float32), ("lastup16", jnp.bfloat16)))
    for name, dt in variants:
        flow = mirror(f1, f2, dt)
        scale = float(jnp.max(jnp.abs(shipped_flow)))
        rel = float(jnp.max(jnp.abs(flow - shipped_flow))) / max(scale, 1e-9)
        print(f"parity {name:9s} vs shipped: max rel {rel:.2e} "
              f"(flow scale {scale:.2f})", flush=True)

    if F32_MODE:
        return  # parity anchor only

    # ---- e2e timing, bench-identical chaining ----
    def chain(fn):
        @jax.jit
        def chained(x, other):
            flow = fn(x, other)
            return x + (jnp.sum(flow.astype(jnp.float32)) * 1e-9).astype(
                x.dtype)
        return lambda x: chained(x, f2)

    def shipped_fn(x, other):
        return model.apply(variables, x, other, iters=ITERS, only_last=True)

    ts = timed(chain(shipped_fn), f1, label="shipped  e2e")
    tl = timed(chain(lambda x, o: mirror(x, o, jnp.float32)), f1,
               label="lastup   e2e")
    tb = timed(chain(lambda x, o: mirror(x, o, jnp.bfloat16)), f1,
               label="lastup16 e2e")
    print(f"pairs/s: shipped {B/ts:.1f}  lastup {B/tl:.1f}  "
          f"lastup16 {B/tb:.1f}", flush=True)
    print(f"lastup win {100*(ts-tl)/ts:+.1f}%   "
          f"lastup16 extra {100*(tl-tb)/tl:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
