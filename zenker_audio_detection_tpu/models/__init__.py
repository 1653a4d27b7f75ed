from . import ast  # noqa: F401
from . import convert  # noqa: F401
