"""alodataset (TPU): streaming datasets emitting aloscene Frames
(re-design of /root/reference/alodataset/__init__.py:3-21)."""

from .base_dataset import BaseDataset, Split  # noqa: F401
from .mixins import SequenceMixin, SplitMixin  # noqa: F401
from . import transforms  # noqa: F401
from .coco_detection import CocoBaseDataset, CocoDetectionDataset  # noqa: F401
from .merge_dataset import MergeDataset  # noqa: F401
from .from_directory import FromDirectoryDataset  # noqa: F401
from .flying_chairs2 import FlyingChairs2Dataset  # noqa: F401
from .sintel import (SintelBaseDataset, SintelFlowDataset,  # noqa: F401
                     SintelDisparityDataset, SintelMultiDataset)


def __getattr__(name):
    # heavier datasets load lazily
    if name == "CocoPanopticDataset":
        from .coco_panoptic import CocoPanopticDataset
        return CocoPanopticDataset
    if name == "Mot17":
        from .mot17 import Mot17
        return Mot17
    if name == "CrowdHumanDataset":
        from .crowd_human import CrowdHumanDataset
        return CrowdHumanDataset
    if name == "WaymoDataset":
        from .waymo import WaymoDataset
        return WaymoDataset
    if name.startswith("Kitti"):
        from . import kitti
        return getattr(kitti, name)
    if name in ("WooDScapeDataset", "WooDScapeSplitDataset"):
        from . import woodscape
        return getattr(woodscape, name)
    if name in ("FlyingThings3DSubsetDataset", "ChairsSDHomDataset"):
        from . import flying_things
        return getattr(flying_things, name)
    if name == "LvisDataset":
        from .lvis import LvisDataset
        return LvisDataset
    raise AttributeError(name)
