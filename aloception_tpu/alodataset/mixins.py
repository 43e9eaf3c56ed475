"""Dataset mixins (reference: alodataset/sequence_mixin.py:1,
split_mixin.py:4)."""

from __future__ import annotations

from .base_dataset import Split


class SequenceMixin:
    """Temporal sequence options (sequence_mixin.py:1)."""

    def __init__(self, sequence_size: int = 2, sequence_skip: int = 0, **kwargs):
        self.sequence_size = sequence_size
        self.sequence_skip = sequence_skip
        super().__init__(**kwargs)


class SplitMixin:
    """train/val/test folder mapping (split_mixin.py:4)."""

    SPLIT_FOLDERS: dict = {}

    def get_split_folder(self) -> str:
        return self.SPLIT_FOLDERS[self.split]
