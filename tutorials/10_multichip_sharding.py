"""Tutorial 10 — multi-chip training: mesh, shardings, and one jitted step
(the TPU-native replacement for the reference's Lightning DDP flag,
alonet/common/pl_helpers.py:372).

Distribution here is declarative: build a device Mesh (dp x tp), annotate
how the batch and the params are laid out, and jit the SAME train step you
use on one chip — XLA inserts the collectives (psum over dp for gradients,
all-gather over tp for sharded matmuls). No process groups, no NCCL, no
wrapper module.

This demo forces 8 VIRTUAL CPU devices so it runs anywhere; on a real TPU
pod slice, delete the virtual-device lines and the same code spans all
chips (multi-host needs only jax.distributed.initialize() first).

Run: python tutorials/10_multichip_sharding.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# --- 8 virtual devices (DEMO ONLY — remove on real hardware) --------------
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from aloception_tpu.models.detr import Detr
    from aloception_tpu.parallel import (make_mesh, partition_params,
                                         replicate, shard_batch)
    from aloception_tpu.train import make_detr_train_step, make_train_state

    print("devices:", len(jax.devices()))

    # --- 1) the mesh: dp=4 data-parallel x tp=2 tensor-parallel ----------
    mesh = make_mesh(n_devices=8, tp=2)
    print("mesh:", dict(mesh.shape))

    # --- 2) an ordinary model + batch -------------------------------------
    model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                 num_encoder_layers=2, num_decoder_layers=2,
                 dim_feedforward=512, stage_sizes=(1, 1, 1, 1))
    B = mesh.shape["dp"] * 2                  # global batch, split over dp
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, 64, 64, 3), jnp.float32)
    mask = jnp.zeros((B, 64, 64), jnp.float32)
    targets = {
        "boxes": jnp.asarray(np.clip(rng.uniform(0.2, 0.8, (B, 8, 4)),
                                     0.05, 0.95).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 10, (B, 8)).astype(np.int32)),
        "valid": jnp.asarray(np.arange(8)[None] < rng.randint(1, 8, (B, 1))),
    }

    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])

    # --- 3) declare layouts, jit the SAME step ----------------------------
    with mesh:
        params = partition_params(params, mesh)   # big matmuls split on tp
        state = make_train_state(model, params, rng=jax.random.PRNGKey(1))
        state = state.replace(opt_state=replicate(state.opt_state, mesh))
        batch = shard_batch({"images": images, "mask": mask,
                             "targets": targets}, mesh)

        step = make_detr_train_step(model)        # unchanged train step
        for i in range(3):
            state, metrics = step(state, batch["images"], batch["mask"],
                                  batch["targets"])
            print(f"step {i}: loss={float(metrics['loss_total']):.4f}")

    # --- 4) inspect a sharding --------------------------------------------
    some_param = jax.tree_util.tree_leaves(state.params)[0]
    print("example param sharding:", some_param.sharding)
    print("batch sharding:", batch["images"].sharding)


if __name__ == "__main__":
    main()
