"""Load the actual reference torch code from /root/reference on CPU.

Used by tests/test_reference_parity.py to run the real reference models
(alonet/detr/detr.py, alonet/raft/raft.py) against the converted flax
models. torchvision / pytorch_lightning / wandb / pycocotools are absent in
this image, so tests/refshims provides just-enough stubs (see
refshims/torchvision/__init__.py for the ground rules).
"""

import os
import sys

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshims")
REF = "/root/reference"

_loaded = {}


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "alonet"))


def load_reference():
    """Import the reference `alonet` + `aloscene` packages (cached)."""
    if "alonet" in _loaded:
        return _loaded["alonet"], _loaded["aloscene"]
    for p in (REF, SHIMS):
        if p not in sys.path:
            sys.path.insert(0, p)
    import alonet
    import aloscene
    _loaded["alonet"] = alonet
    _loaded["aloscene"] = aloscene
    return alonet, aloscene
