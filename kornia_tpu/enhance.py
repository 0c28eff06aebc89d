"""kornia-layout alias: ``kornia_tpu.enhance`` mirrors ``kornia.enhance``."""
from .ops.enhance import *  # noqa: F401,F403
from .ops.jpeg import jpeg_codec_differentiable  # noqa: F401
