from . import color, enhance, filters, morphology, warp
from .color import *  # noqa: F401,F403
from .enhance import *  # noqa: F401,F403
from .filters import *  # noqa: F401,F403
from .morphology import *  # noqa: F401,F403
from .warp import *  # noqa: F401,F403
