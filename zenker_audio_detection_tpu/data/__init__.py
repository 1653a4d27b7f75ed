from . import config  # noqa: F401
from . import splits  # noqa: F401
