from . import aggregate  # noqa: F401
from . import cm_plots  # noqa: F401
from . import roc_pr  # noqa: F401
from . import snippet_eval  # noqa: F401
from . import thresholds  # noqa: F401
