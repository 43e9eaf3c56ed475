from .loader import NativeImageLoader, native_loader_available  # noqa: F401
