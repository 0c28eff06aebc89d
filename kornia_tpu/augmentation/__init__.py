from .base import (
    AugmentationBase2D,
    GeometricAugmentationBase2D,
    IntensityAugmentationBase2D,
)
from .container import AugmentationSequential, DataKey, ImageSequential
from .geometric import *  # noqa: F401,F403
from .intensity import *  # noqa: F401,F403
from .mix import RandomCutMixV2, RandomJigsaw, RandomMixUpV2, RandomMosaic
