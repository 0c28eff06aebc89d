"""kornia-layout alias: ``kornia_tpu.filters`` mirrors ``kornia.filters``."""
from .ops.filters import *  # noqa: F401,F403
from .ops.filters import __all__  # noqa: F401
