"""kornia-layout alias: ``kornia_tpu.morphology`` mirrors ``kornia.morphology``."""
from .ops.morphology import *  # noqa: F401,F403
