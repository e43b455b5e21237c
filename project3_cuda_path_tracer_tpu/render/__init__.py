from .integrator import Renderer, render_samples  # noqa: F401
