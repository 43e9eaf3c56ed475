"""FromDirectoryDataset: glob images from directories
(reference: alodataset/from_directory_dataset.py:11)."""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Union

from ..aloscene import Frame
from .base_dataset import BaseDataset

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class FromDirectoryDataset(BaseDataset):

    def __init__(self, dirs: Union[str, List[str]], name: str = "from_directory",
                 recursive: bool = True, **kwargs):
        super(BaseDataset, self).__init__()
        self.name = name
        self.sample = False
        self.transform_fn = kwargs.get("transform_fn")
        self.max_retry_on_error = kwargs.get("max_retry_on_error", 3)
        self.retry_offset = kwargs.get("retry_offset", 17)
        dirs = [dirs] if isinstance(dirs, str) else dirs
        self.items = []
        for d in dirs:
            pattern = os.path.join(d, "**", "*") if recursive else os.path.join(d, "*")
            for p in sorted(glob.glob(pattern, recursive=recursive)):
                if p.lower().endswith(IMG_EXTENSIONS):
                    self.items.append(p)

    def getitem(self, idx: int) -> Frame:
        return Frame(self.items[idx])
