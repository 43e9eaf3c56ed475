from enum import Enum

import numpy as np
import torch


class ImageReadMode(Enum):
    UNCHANGED = 0
    GRAY = 1
    RGB = 3


def read_image(path: str, mode=ImageReadMode.UNCHANGED) -> torch.Tensor:
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise RuntimeError(f"could not read {path}")
    if img.ndim == 2:
        img = img[:, :, None]
    else:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if mode == ImageReadMode.GRAY and img.shape[2] != 1:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[:, :, None]
    if mode == ImageReadMode.RGB and img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    return torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))
