"""Dataset-tolerated IO errors (reference: aloscene/io/utils/errors.py:1)."""


class InvalidSampleError(Exception):
    """Raised by loaders on corrupted samples; datasets catch it and retry
    with a neighbouring index (base_dataset.py:187-205)."""
