from . import fsio  # noqa: F401
from . import profiling  # noqa: F401
from . import tracking  # noqa: F401
