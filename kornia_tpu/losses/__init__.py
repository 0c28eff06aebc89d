from .losses import *  # noqa: F401,F403
from .robust import *  # noqa: F401,F403
