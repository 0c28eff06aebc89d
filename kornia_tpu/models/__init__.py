from .common import MLP, ConvNormAct, DropPath, LayerNorm2d, TransformerEncoderLayer
from .vit import ViTConfig, VisionTransformer
