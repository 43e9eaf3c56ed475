"""RAFT: Recurrent All-Pairs Field Transforms for optical flow
(reference: alonet/raft/raft.py:16 RAFTBase, :208 RAFT, raft_small.py:8).

TPU design: the all-pairs correlation volume is one MXU matmul
(ops/correlation.py); the 12-iteration refinement is a ``lax.scan`` (single
compiled loop body instead of 12 unrolled python iterations); coordinates are
detached between iterations exactly like the reference (raft.py:182-193);
convex 8x upsampling (raft.py:109-124) is an einsum over the 9-tap mask.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.correlation import (corr_volume, corr_pyramid,
                                corr_lookup, corr_lookup_onehot)
from ...ops.warp import coords_grid
from .extractor import BasicEncoder, SmallEncoder
from .update import BasicUpdateBlock, SmallUpdateBlock


def upflow8(flow):
    """Bilinear 8x upsampling with align_corners=True semantics
    (raft/utils/utils.py:28 upflow8 uses F.interpolate(align_corners=True)),
    values scaled; raft_small path."""
    B, H, W, C = flow.shape
    Ho, Wo = H * 8, W * 8
    # align_corners=True: output endpoints map to input endpoints
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    f = flow
    top = f[:, y0][:, :, x0] * (1 - wx) + f[:, y0][:, :, x0 + 1] * wx
    bot = f[:, y0 + 1][:, :, x0] * (1 - wx) + f[:, y0 + 1][:, :, x0 + 1] * wx
    return (top * (1 - wy) + bot * wy) * 8.0


def convex_upsample(flow, mask):
    """Convex-combination 8x upsample (raft.py:109-124).

    flow: (B, H, W, 2); mask: (B, H, W, 64*9) -> (B, 8H, 8W, 2).
    """
    B, H, W, _ = flow.shape
    # channel layout follows the torch mask head: view(N, 1, 9, 8, 8, H, W)
    # (raft.py:113) — tap index k OUTER, then (u, v) subpixel; keeping this
    # order makes converted torch weights bit-compatible.
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=-3)
    # 3x3 neighborhood of the coarse flow around each pixel (F.unfold pad=1)
    fp = jnp.pad(flow * 8.0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack([fp[:, dy:dy + H, dx:dx + W, :]
                      for dy in range(3) for dx in range(3)], axis=-2)
    # taps: (B, H, W, 9, 2)
    # precision=HIGHEST: default f32 einsum runs bf16 passes on this backend;
    # 9-tap contraction, exactness is free and the flow output is the metric.
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, taps,
                    precision=jax.lax.Precision.HIGHEST)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)


class RAFTBase(nn.Module):
    """(raft.py:16) NHWC frames in minmax_sym normalization."""
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    small: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame1, frame2, iters: int = 12,
                 flow_init: Optional[jnp.ndarray] = None,
                 only_last: bool = False, deterministic: bool = True):
        """frame1/2: (B, H, W, 3), H, W multiples of 8. Returns the list of
        upsampled flow predictions (B, H, W, 2), one per iteration
        (raft.py:133-195), or just the final one with only_last."""
        hdim, cdim = self.hidden_dim, self.context_dim
        Enc = SmallEncoder if self.small else BasicEncoder
        fdim = 128 if self.small else 256

        train = not deterministic
        fnet = Enc(output_dim=fdim, norm_fn="instance", train=train,
                   dtype=self.dtype, name="fnet")
        # shared feature encoder on both frames (raft.py:164)
        fmap1 = fnet(frame1).astype(jnp.float32)
        fmap2 = fnet(frame2).astype(jnp.float32)

        # cnet uses real BatchNorm like the reference (raft.py:87
        # build_cnet norm_fn="batch"); training needs mutable=["batch_stats"]
        cnet = Enc(output_dim=hdim + cdim, norm_fn="batch", train=train,
                   dtype=self.dtype, name="cnet")
        c = cnet(frame1)
        net = jnp.tanh(c[..., :hdim]).astype(jnp.float32)
        inp = nn.relu(c[..., hdim:]).astype(jnp.float32)

        # One MXU matmul builds the all-pairs volume; the pooled pyramid
        # follows (reference alonet/raft/corr.py:18-27). A fused Pallas
        # volume+pyramid kernel (the AlternateCorrBlock analog,
        # corr.py:63) was hardware-timed in round 4 and DELETED: XLA wins
        # (2.07 vs 2.85 ms f32 / 2.11 ms bf16 at Sintel 46x96 B=2) and
        # the kernel could not tile the bench geometry (46x62 rows are
        # not a multiple of 8). DEVELOPMENT.md round-4 negative results.
        pyramid = corr_pyramid(corr_volume(fmap1, fmap2),
                               num_levels=self.corr_levels)

        B, H8, W8, _ = fmap1.shape
        coords0 = jnp.broadcast_to(coords_grid(H8, W8)[None], (B, H8, W8, 2))
        coords1 = coords0 if flow_init is None else coords0 + flow_init

        corr_ch = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        Update = SmallUpdateBlock if self.small else BasicUpdateBlock
        # ONE module instance, used both inside nn.scan (params broadcast)
        # and for the final only_last step outside it — flax binds params by
        # name, so every call shares the same "update_block/..." tree and
        # torch checkpoint conversion stays layout-identical.
        update_block = Update(corr_channels=corr_ch, hidden_dim=hdim,
                              dtype=self.dtype, name="update_block")

        def step(net, coords1, with_mask):
            coords1 = jax.lax.stop_gradient(coords1)  # detach (raft.py:184)
            # gather-free one-hot lookup: ~20x faster than the block
            # dynamic-slice variant on TPU (0.6 vs 12.2 ms/call at 368x496
            # B=2) and its einsum VJP is scatter-free for training
            corr = corr_lookup_onehot(pyramid, coords1,
                                      radius=self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta = update_block(net, inp,
                                            corr.astype(self.dtype),
                                            flow.astype(self.dtype),
                                            with_mask=with_mask)
            return net, coords1 + delta.astype(jnp.float32), mask

        scan_kw = dict(variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True})

        if only_last:
            # Inference fast path (round-5 hardware result,
            # scripts/exp_raft_floor.py, B=2 368x496 it=12 bf16): the mask
            # head + convex upsample + full-res emission inside every scan
            # iteration cost 35% e2e when only the final flow is consumed.
            # Restructure: scan iters-1 carry-only steps without the mask
            # head, then ONE final step with mask + ONE upsample
            # (38.2 -> 49.7 pairs/s; exact math — the mask never feeds the
            # carry; bf16 residual vs the one-scan form is reschedule
            # rounding only). The pyramid is also kept in self.dtype here:
            # the lookup output is cast to self.dtype for the update block
            # anyway, and the bf16 single-pass einsum adds +15.5%
            # (-> 58.8 pairs/s) for a 2.1e-3 flow rel diff. The training
            # path below is untouched (f32 pyramid, per-iteration flows).
            pyramid = [p.astype(self.dtype) for p in pyramid]

            def body_nomask(mdl, carry, _):
                net, coords1 = carry
                net, coords1, _ = step(net, coords1, False)
                return (net, coords1), None

            if iters > 1:
                (net, coords1), _ = nn.scan(
                    body_nomask, length=iters - 1,
                    **scan_kw)(self, (net, coords1), None)
            net, coords1, mask = step(net, coords1, True)
            if mask is None:
                return upflow8(coords1 - coords0)
            return convex_upsample(coords1 - coords0,
                                   mask.astype(jnp.float32))

        def body(mdl, carry, _):
            net, coords1 = carry
            net, coords1, mask = step(net, coords1, True)
            if mask is None:
                flow_up = upflow8(coords1 - coords0)
            else:
                flow_up = convex_upsample(coords1 - coords0,
                                          mask.astype(jnp.float32))
            return (net, coords1), flow_up

        # The 12-iteration refinement is an nn.scan: ONE compiled body with
        # broadcast (weight-tied) update_block params instead of 12 inlined
        # copies — full-model compile dropped 262s -> ~90s on the tunneled
        # TPU with no runtime change. The lifted-function form keeps the
        # param path at "update_block/..." so torch checkpoint conversion is
        # layout-identical to the unrolled form.
        (net, coords1), flows = nn.scan(
            body, length=iters, **scan_kw)(self, (net, coords1), None)
        # unstack to the reference's list-of-predictions interface
        return [flows[i] for i in range(iters)]


class RAFT(RAFTBase):
    """(raft.py:208) standard config: hidden 128, context 128, corr 4/4."""


def raft_small(dtype=jnp.float32) -> RAFTBase:
    """(raft_small.py:8)"""
    return RAFTBase(hidden_dim=96, context_dim=64, corr_levels=4,
                    corr_radius=3, small=True, dtype=dtype)


def inference(flows, frames=None):
    """Final flow prediction -> aloscene.Flow list (raft.py:196-206)."""
    from ...aloscene import Flow
    final = np.asarray(flows[-1] if isinstance(flows, (list, tuple)) else flows)
    return [Flow(np.moveaxis(final[b], -1, 0)) for b in range(final.shape[0])]
