"""Fused on-device preprocessing (jit): uint8 batch -> normalized model input.

The reference preprocesses per sample with torchvision ops in DataLoader
workers (CPU); the TPU-native path ships raw uint8 batches to the device and
runs resize + normalize + augment as ONE fused XLA program (BASELINE.json
north star). Combine with the native C++ loader for host decode:

    host:   jpeg bytes --aloloader--> uint8 HWC batch (threaded C++)
    device: fused_preprocess (this module, inside the train step's jit)

Augmentations here are the jit-compatible subset (batched random hflip,
color jitter); structure-changing augs (RandomSizeCrop) stay host-side in
alodataset.transforms.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

RESNET_MEAN = (0.485, 0.456, 0.406)
RESNET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("out_size", "train", "dtype"))
def fused_preprocess(images, rng: Optional[jax.Array] = None,
                     out_size: Optional[Tuple[int, int]] = None,
                     mean=RESNET_MEAN, std=RESNET_STD, train: bool = False,
                     dtype=jnp.bfloat16):
    """images: (B, H, W, 3) uint8/float. Returns (images dtype NHWC, mask).

    Steps (all fused by XLA): cast -> optional resize -> norm_resnet ->
    optional per-sample random hflip + brightness/contrast jitter.
    """
    x = images.astype(jnp.float32) / 255.0
    if out_size is not None and out_size != x.shape[1:3]:
        x = jax.image.resize(
            x, (x.shape[0],) + tuple(out_size) + (3,), method="bilinear")
    B, H, W, _ = x.shape

    if train and rng is not None:
        k_flip, k_bright, k_contrast = jax.random.split(rng, 3)
        # per-sample random horizontal flip
        flip = jax.random.bernoulli(k_flip, 0.5, (B, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        # photometric jitter (kept label-free: no geometry changes)
        bright = jax.random.uniform(k_bright, (B, 1, 1, 1), minval=0.9,
                                    maxval=1.1)
        contrast = jax.random.uniform(k_contrast, (B, 1, 1, 1), minval=0.9,
                                      maxval=1.1)
        mean_px = x.mean(axis=(1, 2, 3), keepdims=True)
        x = jnp.clip((x - mean_px) * contrast + mean_px * bright, 0.0, 1.0)

    m = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    s = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)
    x = (x - m) / s
    mask = jnp.zeros((B, H, W), jnp.float32)
    return x.astype(dtype), mask


def device_pipeline(loader, native_loader=None, rng=None, train=True,
                    out_size=None, dtype=jnp.bfloat16):
    """Generator: host batches -> device-preprocessed (images, mask).

    loader yields lists of file paths (with native_loader) or uint8 arrays.
    """
    step = 0
    while True:
        for batch in loader:
            if native_loader is not None and isinstance(batch[0], str):
                raw, ok = native_loader.load_batch(batch)
            else:
                raw = batch
            k = None
            if rng is not None:
                k = jax.random.fold_in(rng, step)
            yield fused_preprocess(jnp.asarray(raw), k, out_size=out_size,
                                   train=train, dtype=dtype)
            step += 1
        if not train:
            return
