"""kornia-layout alias: ``kornia_tpu.color`` mirrors ``kornia.color``."""
from .ops.color import *  # noqa: F401,F403
from .ops.colormap import ApplyColorMap, ColorMap, ColorMapType  # noqa: F401
