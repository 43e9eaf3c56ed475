"""Minimal torch-only stand-in for torchvision, used ONLY by the
reference-parity tests (tests/test_reference_parity.py) to run the actual
/root/reference torch models on CPU in an image where torchvision is not
installed. Implements just the surface the reference imports: resnet50 with
torchvision-compatible module names (so state_dicts interchange),
IntermediateLayerGetter, transforms.functional.resize, ops.boxes.nms,
io.read_image. Written from the public torchvision API contract — not a
copy of torchvision sources.
"""

from . import models  # noqa: F401
from . import transforms  # noqa: F401
from . import ops  # noqa: F401
from . import io  # noqa: F401
from . import utils  # noqa: F401

__version__ = "0.0.shim"
