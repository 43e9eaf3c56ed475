"""aloscene (TPU): augmented arrays — labeled data structures that transform
together (re-design of /root/reference/aloscene/__init__.py:2-33)."""

from .augmented import AugmentedArray
from .spatial import SpatialAugmentedArray
from .labels import Labels
from .frame import Frame
from .bounding_boxes_2d import BoundingBoxes2D
from .points_2d import Points2D
from .points_3d import Points3D
from .mask import Mask
from .flow import Flow, SceneFlow
from .disparity import Disparity
from .depth import Depth
from .camera_calib import CameraIntrinsic, CameraExtrinsic, Pose
from .io.errors import InvalidSampleError

# module-level batch_list / temporal_list (aloscene/__init__.py:25)
batch_list = SpatialAugmentedArray.batch_list
temporal_list = SpatialAugmentedArray.temporal_list

__all__ = [
    "AugmentedArray", "SpatialAugmentedArray", "Labels", "Frame",
    "BoundingBoxes2D", "BoundingBoxes3D", "OrientedBoxes2D",
    "Points2D", "Points3D", "Mask", "Flow", "SceneFlow", "Disparity",
    "Depth", "CameraIntrinsic", "CameraExtrinsic", "Pose",
    "InvalidSampleError", "batch_list", "temporal_list", "render",
]


def __getattr__(name):
    # lazy: BoundingBoxes3D / OrientedBoxes2D pull in the rotated-IoU ops
    if name == "BoundingBoxes3D":
        from .bounding_boxes_3d import BoundingBoxes3D
        return BoundingBoxes3D
    if name == "OrientedBoxes2D":
        from .oriented_boxes_2d import OrientedBoxes2D
        return OrientedBoxes2D
    if name in ("render", "render_save"):
        from . import renderer
        return getattr(renderer, name)
    raise AttributeError(name)
