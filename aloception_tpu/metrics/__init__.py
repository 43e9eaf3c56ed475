"""Evaluation metrics (reference: alonet/metrics/)."""

from .ap_metrics import ApMetrics, APDataObject  # noqa: F401
from .pq_metrics import PQMetrics, PQStatCat  # noqa: F401
from .depth_metrics import DepthMetrics  # noqa: F401


def __getattr__(name):
    if name == "ApMetrics3D":
        from .ap_metrics_3d import ApMetrics3D
        return ApMetrics3D
    raise AttributeError(name)
