from . import fir  # noqa: F401
