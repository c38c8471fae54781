from .engine import SearchEngine  # noqa: F401
from .highlight import highlight  # noqa: F401
