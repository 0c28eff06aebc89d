from .common import MLP, ConvNormAct, DropPath, LayerNorm2d, TransformerEncoderLayer
from .rt_detr import DETRPostProcessor, RTDETR, RTDETRConfig
from .sam import Sam, SamConfig, VisualPrompter
from .small_sr import SmallSR, UNetSegmentor
from .vit import ViTConfig, VisionTransformer
