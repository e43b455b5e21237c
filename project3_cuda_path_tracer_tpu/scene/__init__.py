from .parser import load_scene  # noqa: F401
from . import types  # noqa: F401
