"""BoundingBoxes3D: N×7 camera-coordinate boxes [xc, yc, zc, Dx, Dy, Dz,
heading] (reference: aloscene/bounding_boxes_3d.py:26).

Vertices, image projection (via CameraIntrinsic), enclosing 2D boxes and
3D IoU/GIoU via the static-shape rotated-IoU op (TPU replacement of the
reference's CUDA vertex sort).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .augmented import AugmentedArray
from .bounding_boxes_2d import BoundingBoxes2D
from .labels import Labels
from ..ops import rotated_iou as riou


class BoundingBoxes3D(AugmentedArray):

    def __init__(self, x, labels: Union[dict, Labels, None] = None,
                 names=("N", None), **kwargs):
        super().__init__(x, names=names, **kwargs)
        assert self.shape[-1] == 7, "boxes3d are [xc, yc, zc, Dx, Dy, Dz, heading]"
        self.add_child("labels", labels, align_dim=["N"], mergeable=True)
        self.add_child("cam_intrinsic", None, align_dim=["B", "T"],
                       mergeable=True)

    def append_labels(self, labels: Labels, name: Optional[str] = None):
        self._append_child("labels", labels, name)

    def append_cam_intrinsic(self, cam_intrinsic, name: Optional[str] = None):
        self._append_child("cam_intrinsic", cam_intrinsic, name)

    # ------------------------------------------------------------------
    def get_vertices_3d(self) -> np.ndarray:
        """(N, 8, 3) corner vertices in camera coords
        (bounding_boxes_3d.py:88). Heading rotates around the Y axis."""
        b = np.asarray(self.as_numpy()).reshape(-1, 7)
        centers = b[:, :3]
        dx, dy, dz = b[:, 3], b[:, 4], b[:, 5]
        heading = b[:, 6]
        sx = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * 0.5
        sy = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * 0.5
        sz = np.array([1, -1, 1, -1, 1, -1, 1, -1]) * 0.5
        corners = np.stack([sx[None] * dx[:, None], sy[None] * dy[:, None],
                            sz[None] * dz[:, None]], axis=-1)  # (N, 8, 3)
        cos, sin = np.cos(heading), np.sin(heading)
        rot = np.zeros((len(b), 3, 3))
        rot[:, 0, 0] = cos
        rot[:, 0, 2] = sin
        rot[:, 1, 1] = 1
        rot[:, 2, 0] = -sin
        rot[:, 2, 2] = cos
        return np.einsum("nij,nkj->nki", rot, corners) + centers[:, None]

    def get_vertices_3d_proj(self, cam_intrinsic) -> np.ndarray:
        """Project vertices to image pixels (bounding_boxes_3d.py:126)."""
        v = self.get_vertices_3d()
        K = np.asarray(cam_intrinsic.as_numpy()).reshape(-1, cam_intrinsic.shape[-2], 4)[0]
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        z = np.maximum(v[..., 2], 1e-6)
        u = v[..., 0] / z * fx + cx
        w = v[..., 1] / z * fy + cy
        return np.stack([u, w], axis=-1)

    def get_enclosing_box_2d(self, cam_intrinsic, frame_size: Tuple[int, int]
                             ) -> BoundingBoxes2D:
        """Axis-aligned 2D enclosing box of the projection
        (bounding_boxes_3d.py:174)."""
        proj = self.get_vertices_3d_proj(cam_intrinsic)
        x1 = proj[..., 0].min(-1)
        y1 = proj[..., 1].min(-1)
        x2 = proj[..., 0].max(-1)
        y2 = proj[..., 1].max(-1)
        boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
        out = BoundingBoxes2D(boxes, boxes_format="xyxy", absolute=True,
                              frame_size=frame_size)
        labels = self.get_child("labels")
        if labels is not None and not isinstance(labels, dict):
            out.append_labels(labels.clone())
        return out

    def bev_boxes(self) -> np.ndarray:
        """(N, 5) bird's-eye-view rotated boxes [xc, zc, Dx, Dz, heading]
        (bounding_boxes_3d.py:320)."""
        b = np.asarray(self.as_numpy()).reshape(-1, 7)
        return np.stack([b[:, 0], b[:, 2], b[:, 3], b[:, 5], b[:, 6]], -1)

    def iou3d_with(self, boxes2: "BoundingBoxes3D", ret_union=False) -> np.ndarray:
        """Pairwise 3D IoU (bounding_boxes_3d.py:342) via ops/rotated_iou."""
        b1 = _to_riou_layout(self)
        b2 = _to_riou_layout(boxes2)
        return np.asarray(riou.pairwise(riou.cal_iou_3d,
                                        jnp.asarray(b1), jnp.asarray(b2)))

    def giou3d_with(self, boxes2: "BoundingBoxes3D") -> np.ndarray:
        """(bounding_boxes_3d.py:400)"""
        b1 = _to_riou_layout(self)
        b2 = _to_riou_layout(boxes2)
        giou, _ = riou.pairwise(riou.cal_giou_3d, jnp.asarray(b1),
                                jnp.asarray(b2))
        return np.asarray(giou)

    _EDGES = ((0, 1), (1, 3), (3, 2), (2, 0),      # front face
              (4, 5), (5, 7), (7, 6), (6, 4),      # back face
              (0, 4), (1, 5), (2, 6), (3, 7))      # connectors

    def __get_view__(self, frame=None, cam_intrinsic=None, frame_size=None,
                     title=None, **kwargs):
        """Wireframe 3D boxes projected onto the frame
        (reference: aloscene/renderer/bbox3d.py:8 + bounding_boxes_3d.py:472)."""
        from .renderer import View
        import cv2
        intrinsic = cam_intrinsic if cam_intrinsic is not None \
            else self.get_child("cam_intrinsic")
        if intrinsic is None or isinstance(intrinsic, dict):
            return None
        if frame is None:
            fs = frame_size or (300, 300)
            frame = np.zeros((int(fs[0]), int(fs[1]), 3), np.float32)
        img = (np.clip(np.ascontiguousarray(frame), 0, 1) * 255).astype(np.uint8)
        proj = self.get_vertices_3d_proj(intrinsic)
        rngc = np.random.RandomState(11).uniform(0, 255, (300, 3))
        labels = self.get_child("labels")
        lab = np.asarray(labels.as_numpy()).astype(int) \
            if labels is not None and not isinstance(labels, dict) else None
        for n in range(proj.shape[0]):
            color = tuple(int(c) for c in
                          rngc[(lab[n] if lab is not None else n) % 300])
            for a, b in self._EDGES:
                pa = tuple(int(v) for v in proj[n, a])
                pb = tuple(int(v) for v in proj[n, b])
                cv2.line(img, pa, pb, color, 2)
        return View(img.astype(np.float32) / 255.0, title=title)

    def get_view(self, frame=None, **kwargs):
        return self.__get_view__(frame=frame, **kwargs)

    def _hflip(self, cam_extrinsic=None, **kw):
        """Mirror across the camera x axis (bounding_boxes_3d.py:219).

        With ``cam_extrinsic`` (vehicle->camera 4x4) the flip happens in the
        CAMERA frame: centers go through E, x is negated, then back through
        inv(E); headings become -h - 2*rot_y(E) (the reference's
        boxes_3d_hflip semantics)."""
        arr = np.array(self.as_numpy())
        if cam_extrinsic is None or isinstance(cam_extrinsic, dict):
            arr[..., 0] = -arr[..., 0]
            arr[..., 6] = -arr[..., 6]
            return self._with_array(arr)
        E = np.asarray(cam_extrinsic.as_numpy()
                       if hasattr(cam_extrinsic, "as_numpy")
                       else cam_extrinsic, np.float64)
        E = E.reshape(-1, 4, 4)[0]  # temporal extrinsics assumed consistent
        flat = arr.reshape(-1, 7)
        ones = np.ones((flat.shape[0], 1))
        c = np.concatenate([flat[:, :3], ones], -1) @ E.T
        c[:, 0] = -c[:, 0]
        c = c @ np.linalg.inv(E).T
        R = E[:3, :3]
        rot_y = np.arctan2(-R[2, 0], np.hypot(R[2, 1], R[2, 2]))
        out = np.concatenate(
            [c[:, :3], flat[:, 3:6], -flat[:, 6:7] - 2.0 * rot_y], -1)
        return self._with_array(out.reshape(arr.shape).astype(arr.dtype))

    # 3D boxes are invariant under image resize/crop/pad
    def _resize(self, size01, **kw): return self.clone()
    def _crop(self, H_crop, W_crop, **kw): return self.clone()
    def _pad(self, oy, ox, **kw): return self.clone()
    def _vflip(self, **kw):
        arr = np.array(self.as_numpy())
        arr[..., 1] = -arr[..., 1]
        return self._with_array(arr)
    def _spatial_shift(self, sy, sx, **kw): return self.clone()


def _to_riou_layout(boxes: BoundingBoxes3D) -> np.ndarray:
    """[xc, yc, zc, Dx, Dy, Dz, heading] camera coords -> the rotated-IoU
    op layout [x, y(=ground2), z(=height ctr), dx, dy, dz, heading] where the
    BEV plane is (x, z) and the vertical axis is y."""
    b = np.asarray(boxes.as_numpy()).reshape(-1, 7)
    return np.stack([b[:, 0], b[:, 2], b[:, 1], b[:, 3], b[:, 5], b[:, 4],
                     b[:, 6]], -1).astype(np.float32)
