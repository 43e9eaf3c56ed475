"""Weight-drop-day rehearsal: the ``--weights`` eval-CLI path end-to-end.

Saves a REAL reference-format torch state_dict (built by the reference's own
model code, seeded random — the published .pth files are unreachable
offline) to a ``.pth`` file, then drives
``eval_on_coco --weights <file>`` through the byte-identical code a user
runs on weight-drop day: ``torch.load`` -> ``utils/weights.py`` conversion
-> key/shape check -> jitted model -> AP table (reference:
alonet/common/weights.py:34 load_weights + alonet/detr/eval_on_coco.py).
"""

import numpy as np
import pytest

from ref_harness import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")


def test_eval_on_coco_weights_flag(tmp_path):
    load_reference()
    import torch
    from alonet.detr.detr_r50 import DetrR50

    torch.manual_seed(0)
    # the sample fixture declares 4 classes (CocoBaseDataset.SAMPLE_CLASSES)
    ref = DetrR50(num_classes=4, weights=None, aux_loss=False)
    path = tmp_path / "detr-r50.pth"
    torch.save({"model": ref.state_dict()}, path)

    from aloception_tpu.commands.eval_on_coco import main
    all_maps = main(["--model", "detr", "--weights", str(path), "--sample",
                     "--cpu", "--limit_batches", "1", "--size", "96", "128",
                     "--batch_size", "2"])
    # random weights -> no meaningful AP, but the table must exist and be
    # finite: the full load->convert->eval path ran
    assert np.isfinite(all_maps["all"]["all"])


def test_weights_flag_rejects_wrong_shapes(tmp_path):
    """A mismatched checkpoint must fail loudly, never part-load
    (utils/weights.py:383 key-set + shape check)."""
    load_reference()
    import torch
    from alonet.detr.detr_r50 import DetrR50

    torch.manual_seed(0)
    ref = DetrR50(num_classes=17, weights=None, aux_loss=False)
    path = tmp_path / "wrong.pth"
    torch.save({"model": ref.state_dict()}, path)

    from aloception_tpu.commands.eval_on_coco import main
    with pytest.raises(ValueError, match="shape mismatch"):
        main(["--model", "detr", "--weights", str(path), "--sample", "--cpu",
              "--limit_batches", "1", "--size", "96", "128"])
