from .parser import parse  # noqa: F401
from . import ast  # noqa: F401
