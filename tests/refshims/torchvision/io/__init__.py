from . import image  # noqa: F401
from .image import read_image, ImageReadMode  # noqa: F401
