from .renderer import render_frame  # noqa: F401
