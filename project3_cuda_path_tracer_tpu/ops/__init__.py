from . import camera, intersect, bsdf  # noqa: F401
