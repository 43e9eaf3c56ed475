from .errors import InvalidSampleError  # noqa: F401
