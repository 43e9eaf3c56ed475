from . import resnet  # noqa: F401
from . import _utils  # noqa: F401
from .resnet import resnet50, resnet18  # noqa: F401
