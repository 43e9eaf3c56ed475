"""Fused ResNet stage-1 Pallas kernel (the DETR backbone's HBM hot spot).

Round-4 MFU attribution (scripts/exp_backbone_mfu.py, DEVELOPMENT.md): R50
layer3/4 run at 74-89% of the bf16 MXU ceiling — done — but layer1 (stem +
3 stride-1 bottlenecks at stride-4 resolution) is 14 ms of the 27 ms
backbone at 13% MXU and ~50 GB/s: XLA materializes every one of the ~10
intermediate activation tensors (160x160x{64,256} x bs32 = 105-419 MB each)
in HBM between convs it cannot fuse. This kernel runs the WHOLE stage --
all three bottleneck blocks (1x1 -> 3x3 -> 1x1 + shortcut, frozen-BN folded
into weights) -- per spatial strip with every intermediate VMEM-resident:
HBM traffic collapses to one read of the input and one write of the output.

Reference semantics: torchvision Bottleneck stack as used by the DETR
backbone (/root/reference/alonet/detr/backbone.py:50-120; frozen BN
backbone.py:17-47). The stem and stages 2-4 stay XLA (layer3/4 already run
near the MXU roofline; the stem is strided).

Design notes:
- Grid (B, H/Rs): full-width row strips. The input is pre-padded by the
  3-block halo (3 rows/cols each side) in XLA, and each grid step DMAs its
  (Rs+6)-row strip HBM->VMEM (`pltpu.make_async_copy`) — BlockSpecs cannot
  express overlapping windows.
- 3x3 conv = 9 shifted (R*Wp, Cm) @ (Cm, Cm) MXU matmuls over a flattened
  row-major strip. Column wrap-around from the flat shift only lands in
  horizontal-padding columns, which the next stage masks anyway.
- Zero-pad semantics: the unfused stage zero-pads each 3x3 conv's INPUT at
  the image boundary. In the fused strip the boundary halo holds real
  (junk) values, so the kernel multiplies each block's post-relu h1 by an
  in/out-of-image mask before the 3x3 conv — one VPU mask per block makes
  the fusion exact, not approximate.
- Backward: custom_vjp recomputing through `stage_ref` (the plain-XLA
  composition below) — the same block-autodiff pattern as the MSDA kernel
  (training pays exactly what it pays today; inference gets the fused
  path).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, w, cdtype):
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None
    return jax.lax.dot(a.astype(cdtype), w.astype(cdtype),
                       preferred_element_type=jnp.float32, precision=prec)


def _kernel(xs_ref, w1_0, w1_1, w1_2, w2_ref, w3_ref, wd_ref,
            b1_ref, b2_ref, b3_ref, bd_ref, out_ref, *,
            H, W, Rs, n_blocks, interpret):
    """One (batch, strip) grid step: run the whole bottleneck stack on one
    pre-haloed strip in VMEM, write the valid (Rs, W, Co) output tile.

    The haloed strips arrive as a regular blocked input (XLA pre-gathers
    the overlapping windows into a (B, S, R, Wp, Ci) tensor — a 1.4x HBM
    copy of the stage input, ~0.2 ms at bs32): the round-4 hardware gate
    crashed the TPU worker on the manual in-kernel DMA variant, and a
    plain BlockSpec also gets automatic double-buffering."""
    s = pl.program_id(1)
    r0 = s * Rs
    R = Rs + 6
    Wp = W + 6
    cdtype = xs_ref.dtype
    w1_refs = (w1_0, w1_1, w1_2)[:n_blocks]

    # in/out-of-image mask at this strip's global coordinates: tile row t is
    # global row r0 - 3 + t (xp carries 3 pad rows), tile col c is global
    # col c - 3. Zeroing h1 here reproduces the unfused zero-padding of
    # every 3x3 conv input exactly.
    # built directly in flat (R*Wp, 1) form: Mosaic rejects the 2D->flat
    # shape cast ((R, Wp) -> (R*Wp, 1), round-4 hardware gate), so derive
    # (row, col) from a flat iota instead
    flat = jax.lax.broadcasted_iota(jnp.int32, (R * Wp, 1), 0)
    g_row = flat // Wp + (r0 - 3)
    g_col = flat % Wp - 3
    mask = ((g_row >= 0) & (g_row < H) & (g_col >= 0) & (g_col < W))
    mask = mask.astype(cdtype)

    t = xs_ref[0, 0].reshape(R * Wp, xs_ref.shape[-1])
    for j in range(n_blocks):
        Cm = w2_ref.shape[-1]
        h1 = _mm(t, w1_refs[j][:], cdtype) + b1_ref[j:j + 1]
        h1 = (jnp.maximum(h1, 0.0).astype(cdtype) * mask)
        # 3x3 conv as 9 shifted matmuls on the flattened strip; one zero
        # guard row each side + 1 element so every shift is a static slice
        f = jnp.concatenate(
            [jnp.zeros((1, Wp, Cm), cdtype), h1.reshape(R, Wp, Cm),
             jnp.zeros((1, Wp, Cm), cdtype)], axis=0).reshape(-1, Cm)
        f = jnp.concatenate([jnp.zeros((1, Cm), cdtype), f,
                             jnp.zeros((1, Cm), cdtype)], axis=0)
        acc = jnp.zeros((R * Wp, Cm), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(f, (dy * Wp + dx, 0),
                                   (dy * Wp + dx + R * Wp, Cm))
                acc = acc + _mm(sl, w2_ref[j, dy * 3 + dx], cdtype)
        h2 = jnp.maximum(acc + b2_ref[j:j + 1], 0.0).astype(cdtype)
        y = _mm(h2, w3_ref[j], cdtype) + b3_ref[j:j + 1]
        if j == 0:
            sc = _mm(t, wd_ref[:], cdtype) + bd_ref[0:1]
        else:
            sc = t.astype(jnp.float32)
        t = jnp.maximum(y + sc, 0.0).astype(cdtype)

    Co = w3_ref.shape[-1]
    out = t.reshape(R, Wp, Co)[3:3 + Rs, 3:3 + W, :]
    out_ref[0] = out.astype(out_ref.dtype)


def stage_ref(x, fw):
    """Plain-XLA reference for the folded stage (parity oracle + the
    custom_vjp backward): the same bottleneck stack as models/backbone/
    resnet.py Bottleneck with frozen BN already folded into (w, b).
    f32 path pins precision=HIGHEST (the one-bf16-pass trap)."""
    w1s, w2, w3, wd, b1, b2, b3, bd = fw
    n_blocks = w3.shape[0]
    cdtype = x.dtype
    prec = jax.lax.Precision.HIGHEST if cdtype == jnp.float32 else None

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(cdtype), w.astype(cdtype), (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    t = x
    for j in range(n_blocks):
        Cm = w2.shape[-1]
        h1 = jax.nn.relu(mm(t, w1s[j]) + b1[j]).astype(cdtype)
        k = w2[j].reshape(3, 3, Cm, Cm).astype(cdtype)
        h2 = jax.lax.conv_general_dilated(
            h1, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=prec)
        h2 = jax.nn.relu(h2 + b2[j]).astype(cdtype)
        y = mm(h2, w3[j]) + b3[j]
        sc = mm(t, wd) + bd[0] if j == 0 else t.astype(jnp.float32)
        t = jax.nn.relu(y + sc).astype(x.dtype)
    return t


def _pick_rs(H):
    for rs in (16, 8, 4, 2, 1):
        if H % rs == 0:
            return rs
    return 1


@functools.partial(jax.jit, static_argnums=(2,))
def _stage_pallas(x, fw, interpret):
    w1s, w2, w3, wd, b1, b2, b3, bd = fw
    B, H, W, Ci = x.shape
    n_blocks = w3.shape[0]
    Co = w3.shape[-1]
    Rs = _pick_rs(H)
    R, Wp = Rs + 6, W + 6
    cdtype = x.dtype

    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    f32 = jnp.float32
    kernel = functools.partial(_kernel, H=H, W=W, Rs=Rs, n_blocks=n_blocks,
                               interpret=interpret)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, s: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    w1_args = list(w1s) + [w1s[-1]] * (3 - len(w1s))  # pad to 3 refs
    # the strip DMA slices the HBM memref along channels, whose tiling is
    # 128 lanes — Ci=64 misaligns ("slice shape along dimension 3 must be
    # aligned to tiling", round-4 hardware gate). Zero-pad channels to the
    # lane width and the block-0 input-side weights to match (exact: the
    # padded rows contribute 0 to every matmul).
    Ci_p = -(-Ci // 128) * 128
    if Ci_p != Ci:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Ci_p - Ci)))
        w1_args[0] = jnp.pad(w1_args[0], ((0, Ci_p - Ci), (0, 0)))
        wd = jnp.pad(wd, ((0, Ci_p - Ci), (0, 0)))
        Ci = Ci_p
    # pre-haloed strips: XLA gathers the overlapping (R = Rs+6)-row windows
    # into a blocked (B, S, R, Wp, Ci) tensor so the kernel input is a
    # REGULAR BlockSpec (auto double-buffered); the manual in-kernel DMA
    # variant crashed the TPU worker (round-4 hardware gate). Costs one
    # extra R/Rs ~ 1.4x HBM copy of the stage input (~0.2 ms at bs32).
    S = H // Rs
    xs = jnp.stack([xp[:, s * Rs:s * Rs + R] for s in range(S)], axis=1)
    out = pl.pallas_call(
        kernel,
        grid=(B, S),
        in_specs=[pl.BlockSpec((1, 1, R, Wp, Ci),
                               lambda b, s: (b, s, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [full(a) for a in (*w1_args, w2, w3, wd, b1, b2, b3, bd)],
        out_specs=pl.BlockSpec((1, Rs, W, Co), lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x.dtype),
        interpret=interpret,
        # the whole-stage VMEM residency is the point of the kernel: the
        # f32 strip at Rs=16 needs ~33M scoped (bf16 ~17M) vs the 16M
        # default — raise toward the part's 128M physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
    )(xs.astype(cdtype), *[a.astype(f32) for a in w1_args],
      w2.astype(f32), w3.astype(f32), wd.astype(f32),
      b1.astype(f32), b2.astype(f32), b3.astype(f32), bd.astype(f32))
    return out


@jax.custom_vjp
def fused_bottleneck_stage(x, fw):
    """x (B, H, W, Ci) -> (B, H, W, Co) through the folded bottleneck
    stack, fused in VMEM (Pallas on TPU; interpret mode on CPU)."""
    interpret = jax.default_backend() == "cpu"
    return _stage_pallas(x, fw, interpret)


def _fbs_fwd(x, fw):
    return fused_bottleneck_stage(x, fw), (x, fw)


def _fbs_bwd(res, g):
    x, fw = res
    _, vjp = jax.vjp(stage_ref, x, fw)
    return vjp(g)


fused_bottleneck_stage.defvjp(_fbs_fwd, _fbs_bwd)


def fold_stage_params(stage_blocks: Sequence[dict], eps: float = 1e-5):
    """Fold frozen-BN into conv weights for the fused stage.

    stage_blocks: the Bottleneck param subtrees (models/backbone/resnet.py),
    block 0 carrying downsample_conv/downsample_bn. Returns the fw tuple
    consumed by fused_bottleneck_stage / stage_ref.
    """
    def fold(conv, bn):
        k = conv["kernel"].astype(jnp.float32)
        s = bn["scale"] / jnp.sqrt(bn["var"] + eps)
        return k * s, (bn["bias"] - bn["mean"] * s).astype(jnp.float32)

    w1s, w2s, w3s, b1s, b2s, b3s = [], [], [], [], [], []
    for j, p in enumerate(stage_blocks):
        k1, b1 = fold(p["conv1"], p["bn1"])
        k2, b2 = fold(p["conv2"], p["bn2"])
        k3, b3 = fold(p["conv3"], p["bn3"])
        Cm = k1.shape[-1]
        w1s.append(k1.reshape(k1.shape[2], Cm))
        w2s.append(k2.reshape(9, Cm, Cm))
        w3s.append(k3.reshape(Cm, k3.shape[-1]))
        b1s.append(b1)
        b2s.append(b2)
        b3s.append(b3)
        if j == 0:
            kd, bd = fold(p["downsample_conv"], p["downsample_bn"])
            wd = kd.reshape(kd.shape[2], kd.shape[-1])
            bdv = bd[None]
    return (tuple(w1s), jnp.stack(w2s), jnp.stack(w3s), wd,
            jnp.stack(b1s), jnp.stack(b2s), jnp.stack(b3s), bdv)
