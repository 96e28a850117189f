from .figure import Figure, Figures  # noqa: F401
from .report import Report, get_report  # noqa: F401
