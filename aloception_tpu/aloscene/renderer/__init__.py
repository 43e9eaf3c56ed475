from .renderer import (View, Renderer, render, render_save,  # noqa: F401
                       put_adaptive_cv2_text)
