from . import losses  # noqa: F401
from . import loop  # noqa: F401
from . import metrics  # noqa: F401
from . import optim  # noqa: F401
from . import steps  # noqa: F401
