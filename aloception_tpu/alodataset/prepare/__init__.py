"""Dataset preparation converters (reference: alodataset/prepare/)."""
from .waymo_converter import prepare as prepare_waymo  # noqa: F401
