from . import boxes  # noqa: F401
from .boxes import nms  # noqa: F401
