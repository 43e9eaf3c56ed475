from enum import Enum

from . import functional  # noqa: F401


class InterpolationMode(Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class ColorJitter:
    """Stub — reference imports it at module scope (raft_transforms.py) but
    parity tests never exercise photometric augmentation."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


class Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x
