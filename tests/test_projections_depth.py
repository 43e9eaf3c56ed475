"""Camera calibration, depth/disparity conversions, points2d
(mirrors reference unittest/test_projections.py, test_disparity.py,
and the points tests)."""

import numpy as np
import pytest

from aloception_tpu.aloscene import (CameraIntrinsic, CameraExtrinsic, Depth,
                                     Disparity, Frame, Points2D, Points3D,
                                     Pose, Labels)


def _intrinsic(f=100.0, size=(64, 96)):
    return CameraIntrinsic(focal_length=f, plane_size=size)


def test_intrinsic_construction():
    K = _intrinsic()
    assert np.allclose(np.asarray(K.focal_length), [100, 100])
    assert np.allclose(np.asarray(K.principal_points), [48, 32])


def test_intrinsic_transforms_with_frame():
    """Intrinsics adjust under flip/resize/crop/pad (camera_calib.py:99-165)."""
    f = Frame(np.zeros((3, 64, 96), np.float32), normalization="01")
    f.append_cam_intrinsic(_intrinsic())
    # resize halves focals and principal point
    r = f.resize((32, 48))
    K = np.asarray(r.cam_intrinsic.as_numpy())
    assert np.allclose([K[0, 0], K[1, 1]], [50, 50])
    assert np.allclose([K[0, 2], K[1, 2]], [24, 16])
    # hflip mirrors x principal point
    h = f.hflip()
    Kh = np.asarray(h.cam_intrinsic.as_numpy())
    assert np.isclose(Kh[0, 2], 96 - 48)
    # crop shifts principal point
    c = f.crop((0.25, 1.0), (0.25, 1.0))
    Kc = np.asarray(c.cam_intrinsic.as_numpy())
    assert np.isclose(Kc[0, 2], 48 - 24)
    assert np.isclose(Kc[1, 2], 32 - 16)
    # pad shifts principal point the other way
    p = f.pad((0.25, 0.0), (0.25, 0.0))
    Kp = np.asarray(p.cam_intrinsic.as_numpy())
    assert np.isclose(Kp[0, 2], 48 + 24)
    assert np.isclose(Kp[1, 2], 32 + 16)


def test_extrinsic_translation_distance():
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, 3] = [3.0, 0.0, 4.0]
    e1, e2 = CameraExtrinsic(T1), Pose(T2)
    t = e1.translation_with(e2)
    assert np.allclose(t, [3, 0, 4], atol=1e-5)
    assert np.isclose(e1.distance_with(e2), 5.0, atol=1e-5)


def test_depth_points3d_roundtrip():
    """depth -> points3d -> depth map reprojection (depth.py:211,
    points_3d.py:73)."""
    K = _intrinsic(f=50.0, size=(16, 24))
    depth = Depth(np.full((1, 16, 24), 7.0, np.float32))
    depth.append_cam_intrinsic(K)
    pts = depth.as_points3d()
    assert pts.shape == (16 * 24, 3)
    assert np.allclose(np.asarray(pts.as_numpy())[:, 2], 7.0, atol=1e-5)
    back = pts.as_depth(K, (16, 24))
    assert np.allclose(back.as_numpy()[0], 7.0, atol=1e-4)


def test_depth_disparity_roundtrip():
    """depth -> disparity -> depth (depth.py:324, disparity.py:156)."""
    K = _intrinsic(f=80.0, size=(8, 8))
    depth = Depth(np.full((1, 8, 8), 4.0, np.float32), baseline=0.5)
    depth.append_cam_intrinsic(K)
    disp = depth.as_disp(camera_side="left", baseline=0.5)
    assert np.allclose(disp.as_numpy(), 0.5 * 80.0 / 4.0, atol=1e-5)
    back = disp.as_depth(baseline=0.5, camera_intrinsic=K)
    assert np.allclose(back.as_numpy(), 4.0, atol=1e-4)


def test_depth_inverse_roundtrip():
    """encode_absolute(encode_inverse(d)) == d (depth.py:63-106)."""
    d = Depth(np.random.RandomState(0).uniform(1, 50, (1, 8, 8))
              .astype(np.float32))
    inv = d.encode_inverse()
    assert not inv.is_absolute
    back = inv.encode_absolute()
    assert np.allclose(back.as_numpy(), d.as_numpy(), rtol=1e-4)


def test_depth_planar_euclidean_roundtrip():
    K = _intrinsic(f=30.0, size=(8, 8))
    d = Depth(np.full((1, 8, 8), 5.0, np.float32))
    d.append_cam_intrinsic(K)
    eu = d.as_euclidean()
    assert not eu.is_planar
    assert float(eu.as_numpy().min()) >= 5.0  # ray length >= planar Z
    back = eu.as_planar()
    assert np.allclose(back.as_numpy(), 5.0, atol=1e-4)


def test_points2d_ops():
    pts = Points2D(np.array([[0.25, 0.5], [0.8, 0.2]], np.float32),
                   points_format="xy", absolute=False,
                   labels=Labels(np.array([1.0, 2.0], np.float32)))
    # hflip mirrors x
    h = pts._hflip()
    assert np.allclose(np.asarray(h.as_numpy())[:, 0], [0.75, 0.2], atol=1e-6)
    # abs/rel roundtrip
    a = pts.abs_pos((100, 200))
    assert np.allclose(np.asarray(a.as_numpy())[0], [50, 50], atol=1e-4)
    r = a.rel_pos()
    assert np.allclose(r.as_numpy(), pts.as_numpy(), atol=1e-6)
    # crop drops outside points and filters labels with them
    c = pts._crop((0.0, 0.6), (0.0, 0.6))
    assert c.shape[0] == 1
    assert c.labels.shape[0] == 1
    # yx format roundtrip
    yx = pts.yx()
    assert np.allclose(np.asarray(yx.as_numpy())[0], [0.5, 0.25])
    assert np.allclose(yx.xy().as_numpy(), pts.as_numpy())


def test_points2d_pad_and_fit():
    pts = Points2D(np.array([[0.5, 0.5]], np.float32), "xy", False)
    padded = pts._pad((0.0, 1.0), (0.0, 1.0), pad_points2d=True)
    assert np.allclose(np.asarray(padded.as_numpy())[0], [0.25, 0.25])
    recorded = pts._pad((0.0, 1.0), (0.0, 1.0), pad_points2d=False)
    assert recorded.padded_size is not None
    fitted = recorded.fit_to_padded_size()
    assert np.allclose(fitted.as_numpy(), padded.as_numpy(), atol=1e-6)
