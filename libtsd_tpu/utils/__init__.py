from . import geometry, monitor, testing, timedate, wav  # noqa: F401
