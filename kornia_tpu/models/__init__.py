from .common import MLP, ConvNormAct, DropPath, LayerNorm2d, TransformerEncoderLayer
from .rt_detr import DETRPostProcessor, RTDETR, RTDETRConfig
from .efficient_vit import EfficientViT, EfficientViTConfig
from .sam import Sam, SamConfig, VisualPrompter
from .tiny_vit import TinyViT, TinyViTConfig
from .small_sr import SmallSR, UNetSegmentor
from .vit import ViTConfig, VisionTransformer
from .depth_anything import DepthAnything, DepthAnythingConfig, DepthAnythingNet
from .siglip2 import (SigLip2, SigLip2Config, SigLip2Model, SigLip2TextConfig,
                      SigLip2TextTower, SigLip2VisionConfig,
                      SigLip2VisionTower, siglip_loss)
from .vlm import VLM, DecoderConfig, DecoderLM, VLMConfig, VLMModel
from .qwen2_vl import Qwen2VLConfig, Qwen2VLVisionTransformer
from .kimi_vl import KimiVLConfig, KimiVLModel, MoonViTConfig
from .paligemma import PaliGemma, PaliGemmaConfig
from .smolvlm2 import SmolVLM2
from .structures import NaFlex, Prompts, SegmentationResults
from .rrdbnet import RRDBNet, RRDBNetBuilder, RRDBNetConfig
from .siglip2_exact import SigLip2Exact, SigLip2ExactConfig
from .diffusion import (AutoencoderKL, DDIMSchedule, DiffusionConfig,
                        StableDiffusionDissolving, UNet2dCondition)
from .mobile_vit import MobileViT
from .sam3 import ImageEncoderHiera, MaskDecoder3, PromptEncoder3, Sam3
from .dexined import DexiNed
from .yunet import YuNet
