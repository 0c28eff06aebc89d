from . import color, deform_conv, enhance, filters, morphology, pallas_kernels, warp
from .deform_conv import deform_conv2d  # noqa: F401
from .pallas_kernels import fused_separable_blur2d  # noqa: F401
from .color import *  # noqa: F401,F403
from .enhance import *  # noqa: F401,F403
from .filters import *  # noqa: F401,F403
from .morphology import *  # noqa: F401,F403
from .warp import *  # noqa: F401,F403
