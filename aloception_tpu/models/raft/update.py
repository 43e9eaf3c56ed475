"""RAFT recurrent update block (reference: alonet/raft/update.py:35-140).

Motion encoder (corr + flow convs) -> SepConvGRU (separable 1x5 / 5x1 gates)
-> flow head + convex-upsampling mask head.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn


class FlowHead(nn.Module):
    """(update.py:9)"""
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                            dtype=self.dtype, name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)


class SepConvGRU(nn.Module):
    """Separable-conv GRU (update.py:35): horizontal 1x5 pass then vertical
    5x1 pass, each with z/r/q gates."""
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for axis, name in ((1, "h"), (0, "v")):  # 1x5 then 5x1
            ksize = (1, 5) if name == "h" else (5, 1)
            pad = ((0, 0), (2, 2)) if name == "h" else ((2, 2), (0, 0))
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype, name=f"convz_{name}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                   dtype=self.dtype, name=f"convr_{name}")(hx))
            q = nn.tanh(nn.Conv(self.hidden_dim, ksize, padding=pad,
                                dtype=self.dtype, name=f"convq_{name}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class ConvGRU(nn.Module):
    """Plain 3x3 GRU for RAFT-small (update.py:17)."""
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                               dtype=self.dtype, name="convr")(hx))
        q = nn.tanh(nn.Conv(self.hidden_dim, (3, 3), padding=1,
                            dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    """(update.py:63)"""
    corr_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                            name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                            name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                            name="convf2")(f))
        out = nn.relu(nn.Conv(128 - 2, (3, 3), padding=1, dtype=self.dtype,
                              name="conv")(jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SmallMotionEncoder(nn.Module):
    """(update.py:49)"""
    corr_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(96, (1, 1), dtype=self.dtype, name="convc1")(corr))
        f = nn.relu(nn.Conv(64, (7, 7), padding=3, dtype=self.dtype,
                            name="convf1")(flow))
        f = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                            name="convf2")(f))
        out = nn.relu(nn.Conv(80, (3, 3), padding=1, dtype=self.dtype,
                              name="conv")(jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 82 channels


class BasicUpdateBlock(nn.Module):
    """(update.py:103)"""
    corr_channels: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, with_mask: bool = True) -> Tuple:
        motion = BasicMotionEncoder(self.corr_channels, dtype=self.dtype,
                                    name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        # with_mask=False: the mask head never feeds the GRU carry, so
        # only_last inference skips it on all but the final iteration
        # (raft.py only_last path; +23% e2e on hardware, round-5
        # scripts/exp_raft_floor.py — the params are still created by the
        # final with_mask=True call at the same "update_block/..." paths).
        if not with_mask:
            return net, None, delta_flow
        # convex-upsample mask, scaled .25 like the reference (update.py:120)
        mask = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                               name="mask_conv1")(net))
        mask = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_conv2")(mask)
        return net, 0.25 * mask, delta_flow


class SmallUpdateBlock(nn.Module):
    """(update.py:85) — no upsample mask (bilinear upsampling instead)."""
    corr_channels: int
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow, with_mask: bool = True) -> Tuple:
        # with_mask accepted for interface parity with BasicUpdateBlock;
        # the small block has no mask head (mask is always None).
        del with_mask
        motion = SmallMotionEncoder(self.corr_channels, dtype=self.dtype,
                                    name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(128, dtype=self.dtype, name="flow_head")(net)
        return net, None, delta_flow
