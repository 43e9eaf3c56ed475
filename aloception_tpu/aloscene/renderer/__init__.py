from .renderer import View, Renderer, render, put_adaptive_cv2_text  # noqa: F401
