from . import sweep  # noqa: F401
