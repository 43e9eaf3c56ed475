"""Named-weight registry + torch checkpoint conversion
(reference: alonet/common/weights.py:6-31 WEIGHT_NAME_TO_FILES registry and
load_weights:34).

The reference downloads .pth files from GCS; this environment has no egress,
so the registry maps names to *local* paths (user-provided under
``~/.aloception_tpu/weights``) and the converter translates torch state
dicts (NCHW convs, in-proj attention packing) into this framework's flax
pytrees (NHWC, per-head projections).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np

WEIGHTS_DIR = os.path.expanduser("~/.aloception_tpu/weights")

# (weights.py:6-31) the reference's registry names, kept verbatim so a user
# who drops the published .pth files into WEIGHTS_DIR can load them by name
WEIGHT_REGISTRY = {
    "detr-r50": "detr-r50.pth",
    "deformable-detr-r50": "deformable-detr-r50.pth",
    "deformable-detr-r50-refinement": "deformable-detr-r50-refinement.pth",
    "raft-things": "raft-things.pth",
    "raft-chairs": "raft-chairs.pth",
    "raft-sintel": "raft-sintel.pth",
    "raft-kitti": "raft-kitti.pth",
    "raft-small": "raft-small.pth",
    "detr-r50-panoptic": "detr-r50-panoptic.pth",
}


def resolve_weights(name_or_path: str) -> str:
    """(load_weights:34) registry name or direct path -> local file."""
    if os.path.exists(name_or_path):
        return name_or_path
    if name_or_path in WEIGHT_REGISTRY:
        path = os.path.join(WEIGHTS_DIR, WEIGHT_REGISTRY[name_or_path])
        if os.path.exists(path):
            return path
        raise FileNotFoundError(
            f"weights '{name_or_path}' not found at {path}; this environment "
            "has no network egress — place the published file there manually")
    raise FileNotFoundError(f"unknown weights: {name_or_path}")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.ckpt into numpy, stripping Lightning prefixes
    (load_weights 'model.' prefix strip)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(model|module)\.", "", k)
        out[k] = v.detach().cpu().numpy()
    return out


def convert_conv(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_linear(w: np.ndarray) -> np.ndarray:
    """torch linear (O, I) -> flax kernel (I, O)."""
    return np.transpose(w, (1, 0))


def convert_resnet50_backbone(sd: Dict[str, np.ndarray],
                              prefix: str = "backbone.0.body.",
                              space_to_depth: bool = False) -> Dict[str, Any]:
    """torchvision ResNet-50 state dict -> this framework's Backbone params
    (models/backbone/resnet.py naming: trunk/conv1, layer{i}_block{j}/...).
    space_to_depth=True remaps the stem kernel for the s2d stem (exact)."""
    p: Dict[str, Any] = {}

    def bn(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"],
                "mean": sd[src + ".running_mean"],
                "var": sd[src + ".running_var"]}

    conv1 = convert_conv(sd[prefix + "conv1.weight"])
    if space_to_depth:
        from ..models.backbone.resnet import conv1_to_s2d_kernel
        conv1 = np.asarray(conv1_to_s2d_kernel(conv1))
    trunk: Dict[str, Any] = {
        "conv1": {"kernel": conv1},
        "bn1": bn(prefix + "bn1"),
    }
    stage_sizes = (3, 4, 6, 3)
    for li, n_blocks in enumerate(stage_sizes, start=1):
        for b in range(n_blocks):
            src = f"{prefix}layer{li}.{b}."
            block: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                block[f"conv{ci}"] = {
                    "kernel": convert_conv(sd[f"{src}conv{ci}.weight"])}
                block[f"bn{ci}"] = bn(f"{src}bn{ci}")
            if f"{src}downsample.0.weight" in sd:
                block["downsample_conv"] = {
                    "kernel": convert_conv(sd[f"{src}downsample.0.weight"])}
                block["downsample_bn"] = bn(f"{src}downsample.1")
            trunk[f"layer{li}_block{b}"] = block
    p["trunk"] = trunk
    return p


def convert_mha(sd: Dict[str, np.ndarray], src: str, d_model: int,
                nheads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention (packed in_proj) -> flax
    MultiHeadDotProductAttention {query, key, value, out} with
    (in, heads, head_dim) kernels."""
    hd = d_model // nheads
    in_w = sd[f"{src}.in_proj_weight"]   # (3d, d)
    in_b = sd[f"{src}.in_proj_bias"]     # (3d,)
    out_w = sd[f"{src}.out_proj.weight"]  # (d, d)
    out_b = sd[f"{src}.out_proj.bias"]

    def split(i):
        w = in_w[i * d_model:(i + 1) * d_model]      # (d, d) torch (O, I)
        b = in_b[i * d_model:(i + 1) * d_model]
        return {"kernel": convert_linear(w).reshape(d_model, nheads, hd),
                "bias": b.reshape(nheads, hd)}

    return {
        "query": split(0), "key": split(1), "value": split(2),
        "out": {"kernel": out_w.T.reshape(nheads, hd, d_model),
                "bias": out_b},
    }


def convert_detr_checkpoint(sd: Dict[str, np.ndarray], d_model: int = 256,
                            nheads: int = 8, num_enc: int = 6,
                            num_dec: int = 6,
                            space_to_depth: bool = True) -> Dict[str, Any]:
    """Full DETR .pth -> models/detr/Detr flax params (cited naming from
    detr/transformer.py + detr/detr.py). NOTE: attention q/k in the
    reference include positional terms at call time, not in weights, so the
    mapping is 1:1."""
    params: Dict[str, Any] = {}
    params["backbone"] = convert_resnet50_backbone(
        sd, space_to_depth=space_to_depth)
    params["input_proj"] = {
        "kernel": convert_conv(sd["input_proj.weight"]),
        "bias": sd["input_proj.bias"]}
    params["query_embed"] = sd["query_embed.weight"]

    def ln(src):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    def ffn(src):
        return {
            "linear1": {"kernel": convert_linear(sd[src + ".linear1.weight"]),
                        "bias": sd[src + ".linear1.bias"]},
            "linear2": {"kernel": convert_linear(sd[src + ".linear2.weight"]),
                        "bias": sd[src + ".linear2.bias"]},
        }

    tr: Dict[str, Any] = {}
    for i in range(num_enc):
        src = f"transformer.encoder.layers.{i}"
        layer = {"self_attn": convert_mha(sd, src + ".self_attn", d_model, nheads),
                 "norm1": ln(src + ".norm1"), "norm2": ln(src + ".norm2")}
        layer.update(ffn(src))
        tr[f"encoder_layer{i}"] = layer
    for i in range(num_dec):
        src = f"transformer.decoder.layers.{i}"
        layer = {
            "self_attn": convert_mha(sd, src + ".self_attn", d_model, nheads),
            "cross_attn": convert_mha(sd, src + ".multihead_attn", d_model,
                                      nheads),
            "norm1": ln(src + ".norm1"), "norm2": ln(src + ".norm2"),
            "norm3": ln(src + ".norm3")}
        layer.update(ffn(src))
        tr[f"decoder_layer{i}"] = layer
    tr["decoder_norm"] = ln("transformer.decoder.norm")
    params["transformer"] = tr

    params["class_embed"] = {
        "kernel": convert_linear(sd["class_embed.weight"]),
        "bias": sd["class_embed.bias"]}
    params["bbox_embed"] = {
        f"layer{i}": {"kernel": convert_linear(sd[f"bbox_embed.layers.{i}.weight"]),
                      "bias": sd[f"bbox_embed.layers.{i}.bias"]}
        for i in range(3)}
    return {"params": params}


def _ln(sd, src):
    return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}


def _dense(sd, src):
    return {"kernel": convert_linear(sd[src + ".weight"]),
            "bias": sd[src + ".bias"]}


def convert_deformable_checkpoint(sd: Dict[str, np.ndarray],
                                  d_model: int = 256, nheads: int = 8,
                                  num_enc: int = 6, num_dec: int = 6,
                                  num_levels: int = 4,
                                  with_box_refine: bool = False,
                                  space_to_depth: bool = True
                                  ) -> Dict[str, Any]:
    """Deformable-DETR .pth (reference alonet/deformable_detr/
    deformable_detr.py:70 + deformable_transformer.py:306/410 naming) ->
    models/deformable_detr/DeformableDETR flax params.

    MSDeformAttn sub-linears (ops/modules/ms_deform_attn.py:95-98) map 1:1
    to the flax Dense modules; the decoder's torch nn.MultiheadAttention
    goes through convert_mha. Without box refinement the reference clones
    share storage (class_embed.0 == class_embed.1 ...), so only head 0 is
    read."""
    params: Dict[str, Any] = {}
    params["backbone"] = convert_resnet50_backbone(
        sd, space_to_depth=space_to_depth)
    for lvl in range(num_levels):
        params[f"input_proj{lvl}"] = {
            "kernel": convert_conv(sd[f"input_proj.{lvl}.0.weight"]),
            "bias": sd[f"input_proj.{lvl}.0.bias"]}
        params[f"input_proj_gn{lvl}"] = _ln(sd, f"input_proj.{lvl}.1")
    params["query_embed"] = sd["query_embed.weight"]

    def msda(src):
        return {name: _dense(sd, f"{src}.{name}")
                for name in ("sampling_offsets", "attention_weights",
                             "value_proj", "output_proj")}

    tr: Dict[str, Any] = {
        "level_embed": sd["transformer.level_embed"],
        "reference_points": _dense(sd, "transformer.reference_points"),
    }
    for i in range(num_enc):
        src = f"transformer.encoder.layers.{i}"
        tr[f"encoder_layer{i}"] = {
            "self_attn": msda(src + ".self_attn"),
            "norm1": _ln(sd, src + ".norm1"),
            "norm2": _ln(sd, src + ".norm2"),
            "linear1": _dense(sd, src + ".linear1"),
            "linear2": _dense(sd, src + ".linear2"),
        }
    for i in range(num_dec):
        src = f"transformer.decoder.layers.{i}"
        tr[f"decoder_layer{i}"] = {
            "cross_attn": msda(src + ".cross_attn"),
            "self_attn": convert_mha(sd, src + ".self_attn", d_model,
                                     nheads),
            "norm1": _ln(sd, src + ".norm1"),
            "norm2": _ln(sd, src + ".norm2"),
            "norm3": _ln(sd, src + ".norm3"),
            "linear1": _dense(sd, src + ".linear1"),
            "linear2": _dense(sd, src + ".linear2"),
        }
    params["transformer"] = tr

    n_heads = num_dec if with_box_refine else 1
    for i in range(n_heads):
        params[f"class_embed{i}"] = _dense(sd, f"class_embed.{i}")
        params[f"bbox_embed{i}"] = {
            f"layer{j}": _dense(sd, f"bbox_embed.{i}.layers.{j}")
            for j in range(3)}
    return {"params": params}


def convert_panoptic_checkpoint(sd: Dict[str, np.ndarray],
                                space_to_depth: bool = True
                                ) -> Dict[str, Any]:
    """PanopticHead .pth (reference alonet/detr_panoptic/detr_panoptic.py:22,
    'detr.'-prefixed detector + bbox_attention/mask_head) -> a dict with the
    wrapped detector's variables under 'detr' and the flax PanopticHead
    params under 'head' (models/panoptic/panoptic_head.py naming)."""
    detr_sd = {k[len("detr."):]: v for k, v in sd.items()
               if k.startswith("detr.")}
    out: Dict[str, Any] = {
        "detr": convert_detr_checkpoint(detr_sd,
                                        space_to_depth=space_to_depth)}

    head: Dict[str, Any] = {
        "bbox_attention": {
            "q_linear": _dense(sd, "bbox_attention.q_linear"),
            "k_linear": _dense(sd, "bbox_attention.k_linear"),
        }
    }
    mh: Dict[str, Any] = {}
    for i in range(1, 6):
        mh[f"lay{i}_conv"] = {
            "kernel": convert_conv(sd[f"mask_head.lay{i}.weight"]),
            "bias": sd[f"mask_head.lay{i}.bias"]}
        mh[f"lay{i}_gn"] = _ln(sd, f"mask_head.gn{i}")
    for i in range(1, 4):
        mh[f"adapter{i}"] = {
            "kernel": convert_conv(sd[f"mask_head.adapter{i}.weight"]),
            "bias": sd[f"mask_head.adapter{i}.bias"]}
    mh["out_lay"] = {"kernel": convert_conv(sd["mask_head.out_lay.weight"]),
                     "bias": sd["mask_head.out_lay.bias"]}
    head["mask_head"] = mh
    out["head"] = {"params": head}
    return out


def convert_raft_checkpoint(sd: Dict[str, np.ndarray],
                            small: bool = False) -> Dict[str, Any]:
    """RAFT .pth (reference alonet/raft/raft.py:208 RAFT / raft_small.py:8
    RAFTSmall, original-repo key layout) -> models/raft/RAFTBase variables
    {params, batch_stats}.

    fnet uses InstanceNorm (no params); cnet uses BatchNorm — weight/bias go
    to params, running stats to the batch_stats collection."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def conv(src):
        out = {"kernel": convert_conv(sd[src + ".weight"])}
        if src + ".bias" in sd:
            out["bias"] = sd[src + ".bias"]
        return out

    def bn_split(src):
        return ({"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]},
                {"mean": sd[src + ".running_mean"],
                 "var": sd[src + ".running_var"]})

    n_convs = 3 if small else 2           # bottleneck vs residual block
    for enc in ("fnet", "cnet"):
        is_bn = enc == "cnet"             # build_cnet norm_fn="batch"
        p: Dict[str, Any] = {"conv1": conv(f"{enc}.conv1"),
                             "conv2": conv(f"{enc}.conv2")}
        bs: Dict[str, Any] = {}
        if is_bn:
            p["norm1"], bs["norm1"] = bn_split(f"{enc}.norm1")
        for li in (1, 2, 3):
            for b in (0, 1):
                src = f"{enc}.layer{li}.{b}"
                blk: Dict[str, Any] = {}
                blk_bs: Dict[str, Any] = {}
                for ci in range(1, n_convs + 1):
                    blk[f"conv{ci}"] = conv(f"{src}.conv{ci}")
                    if is_bn:
                        blk[f"norm{ci}"], blk_bs[f"norm{ci}"] = bn_split(
                            f"{src}.norm{ci}")
                if f"{src}.downsample.0.weight" in sd:
                    blk["downsample"] = conv(f"{src}.downsample.0")
                    if is_bn:
                        nname = f"norm{n_convs + 1}"
                        blk[nname], blk_bs[nname] = bn_split(
                            f"{src}.downsample.1")
                p[f"layer{li}_{b}"] = blk
                if blk_bs:
                    bs[f"layer{li}_{b}"] = blk_bs
        params[enc] = p
        if bs:
            batch_stats[enc] = bs

    enc_convs = (["convc1", "convf1", "convf2", "conv"] if small
                 else ["convc1", "convc2", "convf1", "convf2", "conv"])
    ub: Dict[str, Any] = {
        "encoder": {c: conv(f"update_block.encoder.{c}") for c in enc_convs},
        "flow_head": {c: conv(f"update_block.flow_head.{c}")
                      for c in ("conv1", "conv2")},
    }
    if small:
        ub["gru"] = {g: conv(f"update_block.gru.{g}")
                     for g in ("convz", "convr", "convq")}
    else:
        ub["gru"] = {f"{g}_{ax}": conv(f"update_block.gru.{g}{i}")
                     for g in ("convz", "convr", "convq")
                     for i, ax in ((1, "h"), (2, "v"))}
        ub["mask_conv1"] = conv("update_block.mask.0")
        ub["mask_conv2"] = conv("update_block.mask.2")
    params["update_block"] = ub

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def load_weights(model_params: Any, name_or_path: str, converter=None) -> Any:
    """Load + convert + shape-check against an existing params pytree."""
    import jax
    path = resolve_weights(name_or_path)
    sd = load_torch_state_dict(path)
    converter = converter or convert_detr_checkpoint
    converted = converter(sd)
    # Key-set + shape check against the model's own init. Keys present in
    # the model but absent from the conversion are an ERROR (an incomplete
    # converter must not yield a silently part-loaded model).
    flat_ref = jax.tree_util.tree_leaves_with_path(model_params)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(converted))
    missing = [path_k for path_k, _ in flat_ref if path_k not in flat_new]
    if missing:
        raise ValueError(
            f"converter produced no value for {len(missing)} model params, "
            f"e.g. {missing[:5]}")
    for path_k, ref in flat_ref:
        if flat_new[path_k].shape != ref.shape:
            raise ValueError(f"shape mismatch at {path_k}: "
                             f"{flat_new[path_k].shape} vs {ref.shape}")
    return converted
