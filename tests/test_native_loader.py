"""Native C++ data-loader core (runtime/aloloader.cpp): decode parity with
the Python path, threaded batching, failure tolerance."""

import os

import numpy as np
import pytest

from aloception_tpu.runtime import NativeImageLoader, native_loader_available

pytestmark = pytest.mark.skipif(not native_loader_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = rng.randint(0, 255, (60, 80, 3), np.uint8)
        p = str(d / (f"{i}.jpg" if i % 2 == 0 else f"{i}.png"))
        cv2.imwrite(p, img[..., ::-1])
        paths.append(p)
    return paths


def test_batch_decode_and_norm(image_dir):
    loader = NativeImageLoader(size=(48, 64), mode="resnet", n_threads=4)
    out, ok = loader.load_batch(image_dir)
    assert out.shape == (6, 48, 64, 3)
    assert ok.all()
    # resnet-normalized values live in roughly (-3, 3)
    assert -4 < out.min() and out.max() < 4


def test_parity_with_python_path(image_dir):
    """Native decode+resize+normalize == Frame(path).norm_resnet().resize()
    (PNG path: lossless, so parity is near-exact)."""
    from aloception_tpu.aloscene import Frame
    png = [p for p in image_dir if p.endswith(".png")][0]
    loader = NativeImageLoader(size=(48, 64), mode="resnet")
    native = loader.load(png)
    ref = np.asarray(Frame(png).norm_resnet().resize((48, 64))
                     .as_layout(("H", "W", "C")))
    assert np.abs(native - ref).max() < 1e-2


def test_modes(image_dir):
    raw = NativeImageLoader(size=(32, 32), mode="raw").load(image_dir[0])
    assert raw.max() > 1.5  # 0..255
    n01 = NativeImageLoader(size=(32, 32), mode="01").load(image_dir[0])
    assert 0 <= n01.min() and n01.max() <= 1


def test_failure_tolerance(image_dir, tmp_path):
    corrupt = str(tmp_path / "corrupt.jpg")
    with open(corrupt, "wb") as f:
        f.write(b"not an image")
    loader = NativeImageLoader(size=(32, 32))
    out, ok = loader.load_batch([image_dir[0], str(tmp_path / "missing.jpg"),
                                 corrupt])
    assert ok.tolist() == [True, False, False]
    assert np.abs(out[1:]).sum() == 0.0
    from aloception_tpu.aloscene import InvalidSampleError
    with pytest.raises(InvalidSampleError):
        loader.load(corrupt)
