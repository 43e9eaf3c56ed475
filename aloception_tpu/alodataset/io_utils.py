"""Filesystem helpers for dataset preparation
(reference: alodataset/io/fs.py:7 move_and_replace)."""

from __future__ import annotations

import os
import shutil


def move_and_replace(src_dir: str, dst_dir: str):
    """Merge src_dir into dst_dir, replacing collisions (io/fs.py:7) —
    used by prepare() flows that unpack archives incrementally."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src_dir):
        src = os.path.join(src_dir, name)
        dst = os.path.join(dst_dir, name)
        if os.path.isdir(src):
            move_and_replace(src, dst)
            try:
                os.rmdir(src)
            except OSError:
                pass
        else:
            if os.path.exists(dst):
                os.remove(dst)
            shutil.move(src, dst)
