"""FULL-MODEL numeric parity against the actual reference torch code.

Builds the reference models from /root/reference (torch CPU, seeded random
weights — the published .pth files are unreachable offline), converts their
state_dicts through utils/weights.py, and asserts the flax models reproduce
the torch outputs end-to-end. This is the model-scale counterpart of the
primitive-level checks in test_weights_convert.py.

Reference entry points exercised:
- DETR-R50 forward in tracing mode (alonet/detr/detr.py:126, misc.py:9)
- RAFT forward (alonet/raft/raft.py:133)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_harness import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")


def _sd_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def torch_mods():
    load_reference()
    import torch
    return torch


def test_detr_r50_full_model_parity(torch_mods):
    """Converted reference DETR-R50 weights reproduce pred_logits/pred_boxes
    (detr.py:126) within fp32 tolerance on a real-size input."""
    torch = torch_mods
    from alonet.detr.detr_r50 import DetrR50
    from aloception_tpu.models.detr import detr_r50
    from aloception_tpu.utils.weights import convert_detr_checkpoint

    torch.manual_seed(0)
    ref = DetrR50(num_classes=91, weights=None, tracing=True, aux_loss=False)
    ref.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 320, 320).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    img = (img - mean) / std
    # second image padded on the right third (mask 1 = padded, detr.py:133)
    tmask = np.zeros((2, 1, 320, 320), np.float32)
    img[1, :, :, 220:] = 0.0
    tmask[1, :, :, 220:] = 1.0

    with torch.no_grad():
        out = ref(torch.from_numpy(np.concatenate([img, tmask], 1)))
    ref_logits = out.pred_logits.numpy()
    ref_boxes = out.pred_boxes.numpy()

    variables = convert_detr_checkpoint(_sd_to_numpy(ref))
    model = detr_r50(num_classes=91, dtype=jnp.float32)
    fwd = jax.jit(lambda v, im, m: model.apply(v, im, m))
    got = fwd(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
              jnp.asarray(tmask[:, 0]))
    got_logits = np.asarray(got["pred_logits"], np.float32)
    got_boxes = np.asarray(got["pred_boxes"], np.float32)

    assert got_logits.shape == ref_logits.shape
    assert np.max(np.abs(got_logits - ref_logits)) < 1e-3, (
        f"logits diff {np.max(np.abs(got_logits - ref_logits))}")
    assert np.max(np.abs(got_boxes - ref_boxes)) < 1e-3, (
        f"boxes diff {np.max(np.abs(got_boxes - ref_boxes))}")


@pytest.mark.parametrize("refine", [False, True])
def test_deformable_detr_full_model_parity(torch_mods, refine):
    """Converted reference Deformable-DETR-R50 (+/- box refinement) weights
    reproduce pred_logits/pred_boxes end-to-end on CPU via the reference's
    pure-torch MSDA fallback (ops/functions/ms_deform_attn_func.py:85,
    routed by the is_tracing kwarg, ops/modules/ms_deform_attn.py:150)."""
    torch = torch_mods
    # the CUDA custom-op loader would invoke make.sh/nvcc — neutralize it
    import alonet.deformable_detr.ops.modules.ms_deform_attn as ref_mod
    ref_mod.load_MultiScaleDeformableAttention = lambda: None

    if refine:
        from alonet.deformable_detr.deformable_detr_r50_refinement import (
            DeformableDetrR50Refinement as RefModel)
    else:
        from alonet.deformable_detr.deformable_detr_r50 import (
            DeformableDetrR50 as RefModel)
    from aloception_tpu.models.deformable_detr import deformable_detr_r50
    from aloception_tpu.utils.weights import convert_deformable_checkpoint

    torch.manual_seed(0)
    ref = RefModel(num_classes=91, weights=None, device=None, tracing=True,
                   aux_loss=False)
    ref.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 320, 320).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    img = (img - mean) / std

    with torch.no_grad():
        out = ref(torch.from_numpy(img), is_tracing=True)
    ref_logits = out.pred_logits.numpy()
    ref_boxes = out.pred_boxes.numpy()

    variables = convert_deformable_checkpoint(_sd_to_numpy(ref),
                                              with_box_refine=refine)
    model = deformable_detr_r50(num_classes=91, with_box_refine=refine,
                                aux_loss=False, msda_impl="lax",
                                dtype=jnp.float32)
    mask = jnp.zeros((1, 320, 320), jnp.float32)
    fwd = jax.jit(lambda v, im, m: model.apply(v, im, m))
    got = fwd(variables, jnp.asarray(img.transpose(0, 2, 3, 1)), mask)
    got_logits = np.asarray(got["pred_logits"], np.float32)
    got_boxes = np.asarray(got["pred_boxes"], np.float32)

    assert got_logits.shape == ref_logits.shape
    ld = np.max(np.abs(got_logits - ref_logits))
    bd = np.max(np.abs(got_boxes - ref_boxes))
    assert ld < 2e-3, f"logits diff {ld}"
    assert bd < 2e-3, f"boxes diff {bd}"


def test_panoptic_head_full_model_parity(torch_mods):
    """Converted reference PanopticHead(DETR-R50) weights reproduce
    pred_masks / pred_logits / pred_boxes (detr_panoptic.py:120-181, CPU,
    tracing mode so every query flows through the mask head)."""
    torch = torch_mods
    from alonet.detr.detr_r50 import DetrR50
    from alonet.detr_panoptic.detr_panoptic import PanopticHead as RefHead
    from aloception_tpu.models.detr import detr_r50
    from aloception_tpu.models.panoptic import PanopticHead
    from aloception_tpu.utils.weights import convert_panoptic_checkpoint

    torch.manual_seed(0)
    detr = DetrR50(num_classes=91, weights=None, aux_loss=False)
    ref = RefHead(detr, freeze_detr=False, aux_loss=False, device=None,
                  tracing=True)
    ref.eval()

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 256, 256).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    img = (img - mean) / std
    tmask = np.zeros((2, 1, 256, 256), np.float32)

    with torch.no_grad():
        out = ref(torch.from_numpy(np.concatenate([img, tmask], 1)))
    out = out._asdict() if hasattr(out, "_asdict") else out
    ref_masks = out["pred_masks"].numpy()
    ref_logits = out["pred_logits"].numpy()
    ref_boxes = out["pred_boxes"].numpy()

    variables = convert_panoptic_checkpoint(_sd_to_numpy(ref))
    detector = detr_r50(num_classes=91, aux_loss=False,
                        return_intermediate=True, dtype=jnp.float32)
    head = PanopticHead(dtype=jnp.float32)

    images = jnp.asarray(img.transpose(0, 2, 3, 1))
    mask = jnp.asarray(tmask[:, 0])
    fwd = jax.jit(lambda dv, hv, im, m: head.apply(
        hv, detector.apply(dv, im, m)))
    got = fwd(variables["detr"], variables["head"], images, mask)

    got_masks = np.asarray(got["pred_masks"], np.float32)
    assert got_masks.shape == ref_masks.shape
    ld = np.max(np.abs(np.asarray(got["pred_logits"]) - ref_logits))
    bd = np.max(np.abs(np.asarray(got["pred_boxes"]) - ref_boxes))
    md = np.max(np.abs(got_masks - ref_masks))
    assert ld < 2e-3, f"logits diff {ld}"
    assert bd < 2e-3, f"boxes diff {bd}"
    assert md < 5e-3, f"masks diff {md}"


class _FakeFrame:
    """Duck-typed stand-in for aloscene.Frame: torch 2.13 removed named
    tensors so the reference aloscene cannot run; RAFT.forward only touches
    .normalization and .as_tensor() (raft.py:157-160)."""

    normalization = "minmax_sym"

    def __init__(self, t):
        self._t = t

    def as_tensor(self):
        return self._t


@pytest.mark.parametrize("small", [False, True])
def test_raft_full_model_parity(torch_mods, small):
    """Converted reference RAFT weights reproduce every iteration's
    upsampled flow (raft.py:133-195) within fp32 tolerance."""
    torch = torch_mods
    from alonet.raft.raft import RAFT as RefRAFT
    from alonet.raft.raft_small import RAFTSmall as RefRAFTSmall
    from aloception_tpu.models.raft import RAFT, raft_small
    from aloception_tpu.utils.weights import convert_raft_checkpoint

    # Reference bugs make RAFTSmall unrunnable as-is: (1) it never defines
    # the abstract out_plane attr (raft_small.py:8 vs raft.py:236); (2)
    # SmallUpdateBlock wires ConvGRU with input_dim=hidden_dim+49=145
    # (update.py:108) while its real input is cdim 64 + motion 82 = 146
    # channels (original-repo value). Patch both minimally so the remaining
    # reference code can execute.
    RefRAFTSmall.out_plane = 2
    torch.manual_seed(0)
    ref = (RefRAFTSmall if small else RefRAFT)(weights=None)
    if small:
        from alonet.raft.update import ConvGRU as RefConvGRU
        ref.update_block.gru = RefConvGRU(hidden_dim=96, input_dim=64 + 82)
    ref.eval()

    # NOTE: smaller inputs make the reference NaN — its bilinear_sampler
    # (raft/utils/utils.py:9) normalizes by (H-1), and a 96px image's 4th
    # pyramid level is 1px tall -> division by zero. 192x160 keeps every
    # level >= 2px.
    rng = np.random.RandomState(1)
    f1 = (rng.rand(1, 3, 192, 160).astype(np.float32) * 2 - 1)
    f2 = (rng.rand(1, 3, 192, 160).astype(np.float32) * 2 - 1)
    iters = 3

    with torch.no_grad():
        m_outputs = ref(_FakeFrame(torch.from_numpy(f1)),
                        _FakeFrame(torch.from_numpy(f2)), iters=iters)
    ref_flows = [o["up_flow"].numpy().transpose(0, 2, 3, 1)
                 for o in m_outputs]

    variables = convert_raft_checkpoint(_sd_to_numpy(ref), small=small)
    model = raft_small() if small else RAFT()
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=iters))
    flows = fwd(variables, jnp.asarray(f1.transpose(0, 2, 3, 1)),
                jnp.asarray(f2.transpose(0, 2, 3, 1)))

    assert len(flows) == len(ref_flows)
    for i, (got, want) in enumerate(zip(flows, ref_flows)):
        got = np.asarray(got, np.float32)
        assert got.shape == want.shape
        diff = np.max(np.abs(got - want))
        assert diff < 2e-3, f"iter {i}: flow diff {diff}"
