"""Tutorial 8 — optical flow with RAFT: recurrent refinement, EPE, and the
Flow label type (compare the reference's alonet/raft/README.md usage).

RAFT correlates every pixel pair between two frames (one MXU matmul), then
iteratively refines a flow field with a conv-GRU. The TPU build runs the
refinement as a lax.scan and looks up correlation windows with a gather-free
one-hot formulation.

Run: python tutorials/08_raft_optical_flow.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # tiny model: runs anywhere
    import jax.numpy as jnp

    from aloception_tpu.aloscene import Frame
    from aloception_tpu.models.raft import RAFTBase
    from aloception_tpu.models.raft.raft import inference

    # --- a synthetic pair with KNOWN flow: frame2 = frame1 shifted 8px → x
    rng = np.random.RandomState(0)
    base = rng.uniform(0, 255, (3, 96, 136)).astype(np.float32)
    shift = 8
    img1 = base[:, :, :128]
    img2 = base[:, :, shift:shift + 128]   # img1 content reappears `shift` px to the right

    # frames must be minmax_sym normalized for RAFT (reference asserts this)
    f1 = Frame(img1).norm_minmax_sym()
    f2 = Frame(img2).norm_minmax_sym()

    # NHWC device arrays
    x1 = jnp.asarray(np.moveaxis(f1.as_numpy(), 0, -1))[None]
    x2 = jnp.asarray(np.moveaxis(f2.as_numpy(), 0, -1))[None]

    # --- a small RAFT (random init: structure demo; load converted weights
    # via utils.weights.load_weights("raft-things") for real quality)
    model = RAFTBase(hidden_dim=64, context_dim=64, corr_levels=4,
                     corr_radius=3)
    variables = model.init(jax.random.PRNGKey(0), x1, x2, iters=2)

    flows = jax.jit(
        lambda a, b: model.apply(variables, a, b, iters=6)
    )(x1, x2)
    print("per-iteration predictions:", len(flows),
          "each", flows[0].shape, "(B, H, W, 2)")

    # --- EPE against the known ground truth --------------------------------
    gt = np.zeros((96, 128, 2), np.float32)
    gt[..., 0] = shift                     # img1 content found `shift` px right
    for it in (0, 2, 5):
        epe = float(np.sqrt(((np.asarray(flows[it][0]) - gt) ** 2)
                            .sum(-1)).mean())
        print(f"  iter {it}: EPE {epe:6.2f} px   (random weights!)")

    # --- flow as an aloscene label ------------------------------------------
    flow_labels = inference(flows)
    f1.append_flow(flow_labels[0])
    out = "/tmp/alo_tutorial08_flow.png"
    f1.flow.get_view().save(out)           # Middlebury color wheel render
    print("flow label:", f1.flow.shape, "->", out)


if __name__ == "__main__":
    main()
