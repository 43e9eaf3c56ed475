"""Views + renderer (reference: aloscene/renderer/renderer.py:91 View,
:172 Renderer, module-level aloscene.render, aloscene/__init__.py:33).

A View is a float [0,1] HWC image + title; the Renderer composites views into
a grid and displays (cv2) or records to mp4. Headless-safe: rendering to
files works without a display.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Union

import numpy as np


def put_adaptive_cv2_text(frame: np.ndarray, text: str, x: int, y: int,
                          color=(0, 1.0, 0)):
    """Text scaled to the frame size (renderer.py:24). Accepts float [0,1] or
    uint8 frames (OpenCV 5 putText requires uint8) — draws in place when
    uint8, otherwise round-trips through uint8."""
    import cv2
    scale = max(frame.shape[0], frame.shape[1]) / 1000.0
    scale = max(scale, 0.4)
    is_float = frame.dtype != np.uint8
    img = (np.clip(frame, 0, 1) * 255).astype(np.uint8) if is_float else frame
    c = tuple(int(v * 255) if isinstance(v, float) and v <= 1 else int(v)
              for v in color)
    cv2.putText(img, str(text), (int(x), int(y)), cv2.FONT_HERSHEY_SIMPLEX,
                scale, c, max(int(2 * scale), 1), cv2.LINE_AA)
    if is_float:
        frame[:] = img.astype(np.float32) / 255.0
    return frame


class View:
    """(renderer.py:91)"""

    CV = "cv"
    MATPLOTLIB = "matplotlib"

    def __init__(self, image: np.ndarray, title: Optional[str] = None):
        image = np.asarray(image, np.float32)
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, -1)
        if image.max() > 1.5:
            image = image / 255.0
        self.image = np.clip(image, 0, 1)
        self.title = title

    def add(self, view: "View") -> "View":
        """Horizontal concat of two views, padded to the tallest."""
        h = max(self.image.shape[0], view.image.shape[0])
        def padded(img):
            pad = h - img.shape[0]
            return np.pad(img, ((0, pad), (0, 0), (0, 0)))
        self.image = np.concatenate([padded(self.image), padded(view.image)], 1)
        return self

    def render(self, method: str = CV, location: Optional[str] = None,
               figsize=(10, 10)):
        if location is not None:
            return self.save(location)
        if method == self.MATPLOTLIB:
            import matplotlib
            import matplotlib.pyplot as plt
            plt.figure(figsize=figsize)
            plt.imshow(self.image)
            if self.title:
                plt.title(self.title)
            plt.axis("off")
            plt.show()
        else:
            import cv2
            cv2.imshow(self.title or "aloception", self.image[..., ::-1])
            cv2.waitKey(1)

    def save(self, location: str):
        import cv2
        img = (self.image * 255).astype(np.uint8)[..., ::-1]
        if not os.path.splitext(location)[1]:
            location += ".png"
        cv2.imwrite(location, img)
        return location


class Renderer:
    """(renderer.py:172) grid compositing + streaming display / mp4 record."""

    def __init__(self):
        self._writer = None
        self._path = None

    @staticmethod
    def _title_banner(img: np.ndarray, title: str) -> np.ndarray:
        """Dark banner strip above a cell carrying its title
        (reference add_title, renderer.py:251 — titles get their own strip
        instead of overwriting image pixels)."""
        bh = max(18, img.shape[0] // 12)
        banner = np.full((bh, img.shape[1], 3), 0.15, np.float32)
        put_adaptive_cv2_text(banner, title, 8, int(bh * 0.75),
                              color=(1.0, 1.0, 1.0))
        return np.concatenate([banner, img], axis=0)

    @staticmethod
    def get_grid_view(views: Sequence[View], cell_grid_size=None,
                      grid_size=None, add_title: bool = True) -> np.ndarray:
        """Composite views into a square-ish grid (renderer.py:203). Titles
        are drawn as banner strips above each cell when add_title."""
        views = list(views)
        n = len(views)
        assert n >= 1
        cols = grid_size or math.ceil(math.sqrt(n))
        rows = math.ceil(n / cols)
        if cell_grid_size is None:
            cell_grid_size = views[0].image.shape[:2]
        ch, cw = cell_grid_size
        import cv2
        bh = max(18, ch // 12) if add_title else 0
        grid = np.zeros((rows * (ch + bh), cols * cw, 3), np.float32)
        for i, v in enumerate(views):
            r, c = divmod(i, cols)
            img = cv2.resize(v.image, (cw, ch))
            if add_title:
                img = Renderer._title_banner(img, v.title or "")
            grid[r * (ch + bh):(r + 1) * (ch + bh),
                 c * cw:(c + 1) * cw] = img
        return grid

    @classmethod
    def get_user_defined_grid_view(cls, views, add_title: bool = True
                                   ) -> np.ndarray:
        """Composite a NESTED list of views into exactly that layout
        (renderer.py:278): ``views`` is a list of rows, each a list of View.
        Cells are resized to the first view's size; short rows are padded
        with black cells."""
        import cv2
        rows = [list(r) for r in views]
        first = rows[0][0]
        ch, cw = first.image.shape[:2]
        bh = max(18, ch // 12) if add_title else 0
        ncols = max(len(r) for r in rows)
        grid = np.zeros((len(rows) * (ch + bh), ncols * cw, 3), np.float32)
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                img = cv2.resize(v.image, (cw, ch))
                if add_title:
                    img = cls._title_banner(img, v.title or "")
                grid[r * (ch + bh):(r + 1) * (ch + bh),
                     c * cw:(c + 1) * cw] = img
        return grid

    def render(self, views: Sequence[View], renderer: str = "cv",
               cell_grid_size=None, record_file: Optional[str] = None,
               fps: int = 30, grid_size=None, skip_views: bool = False,
               add_title: bool = True):
        """(renderer.py:311) display a grid and/or append to an mp4.
        ``views`` may be a flat list (auto grid) or a nested list of rows
        (user-defined layout, renderer.py:278)."""
        if views and isinstance(views[0], (list, tuple)):
            grid = self.get_user_defined_grid_view(views, add_title)
        else:
            grid = self.get_grid_view(views, cell_grid_size, grid_size,
                                      add_title)
        if record_file is not None:
            import cv2
            if self._writer is None:
                self._path = record_file
                fourcc = cv2.VideoWriter_fourcc(*"mp4v")
                self._writer = cv2.VideoWriter(
                    record_file, fourcc, fps, (grid.shape[1], grid.shape[0]))
            self._writer.write((grid[..., ::-1] * 255).astype(np.uint8))
        elif not skip_views:
            import cv2
            cv2.imshow("aloception", grid[..., ::-1])
            cv2.waitKey(1)
        return grid

    def save(self):
        """Finalize the recording (renderer.py:363)."""
        if self._writer is not None:
            self._writer.release()
            self._writer = None
        return self._path


_module_renderer: Optional[Renderer] = None


def render(views: Sequence[View], renderer: str = "cv", size=None,
           record_file: Optional[str] = None, fps=30, grid_size=None,
           skip_views=False):
    """Module-level convenience (aloscene/__init__.py:33). Keeps ONE
    persistent Renderer so repeated calls append to the same mp4 recording
    (the reference's module singleton); call aloscene.render_save() (or
    the returned renderer's .save()) to finalize."""
    global _module_renderer
    if _module_renderer is None:
        _module_renderer = Renderer()
    return _module_renderer.render(views, renderer=renderer,
                                   cell_grid_size=size,
                                   record_file=record_file, fps=fps,
                                   grid_size=grid_size, skip_views=skip_views)


def render_save():
    """Finalize the module-level recording, returning the mp4 path."""
    global _module_renderer
    if _module_renderer is None:
        return None
    path = _module_renderer.save()
    _module_renderer = None
    return path
