"""Tutorial 17 — pipeline parallelism: run a transformer layer stack as
GPipe stages over the mesh's ``pp`` axis (parallel/pipeline.py).

The reference scales only by DDP replication; on a TPU pod the deep
homogeneous stacks (DETR's 6 encoder layers) can ALSO be split across
chips: each chip holds a contiguous slice of the stacked per-layer params,
and activations hop stage-to-stage over ICI with ``lax.ppermute``, one
microbatch per tick. Autodiff runs straight through the pipeline, so the
same call trains.

This demo forces 8 VIRTUAL CPU devices so it runs anywhere.

Run: python tutorials/17_pipeline_parallelism.py       (CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

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
    from aloception_tpu.models.detr.transformer import EncoderLayer
    from aloception_tpu.parallel import (make_mesh, gpipe,
                                         stack_layer_params,
                                         shard_layer_stack)

    # --- 1) a 4-layer encoder stack, params STACKED on a layer axis ------
    layer = EncoderLayer(d_model=64, nheads=4, dim_feedforward=128,
                         dropout=0.0)
    rng = np.random.RandomState(0)
    B, L, D = 8, 24, 64
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    mask = jnp.zeros((B, L), jnp.float32)
    params = [layer.init(jax.random.PRNGKey(i), x, pos, mask)["params"]
              for i in range(4)]
    stacked = stack_layer_params(params)    # leaves gain a leading (4,) axis

    # --- 2) mesh with a pipeline axis: dp=4 x pp=2 (2 layers per stage) --
    mesh = make_mesh(n_devices=8, pp=2)
    print("mesh:", dict(mesh.shape))
    stacked = shard_layer_stack(stacked, mesh)   # each chip holds its stage

    # --- 3) the pipelined forward: identical numerics, staged execution --
    def apply_one(p, act, extras):
        return layer.apply({"params": p}, act, extras["pos"],
                           extras["mask"])

    out = gpipe(apply_one, stacked, x, {"pos": pos, "mask": mask},
                mesh, n_micro=2)

    seq = x
    for p in params:
        seq = layer.apply({"params": p}, seq, pos, mask)
    print("pipeline vs sequential maxdiff:",
          float(jnp.abs(out - seq).max()))

    # --- 4) and it TRAINS: grads flow through ppermute's transpose -------
    def loss_fn(stacked):
        y = gpipe(apply_one, stacked, x, {"pos": pos, "mask": mask},
                  mesh, n_micro=2)
        return (y ** 2).mean()

    grads = jax.grad(loss_fn)(stacked)
    gnorm = float(jnp.sqrt(sum((g ** 2).sum()
                               for g in jax.tree.leaves(grads))))
    print("pipelined grad norm:", round(gnorm, 4))
    print("\nGPipe bubble: (S-1)/(M+S-1) idle fraction — raise n_micro to "
          "amortize; stage params P('pp') mean each chip stores only its "
          "layers (pairs with FSDP over dp for the rest of the model).")


if __name__ == "__main__":
    main()
