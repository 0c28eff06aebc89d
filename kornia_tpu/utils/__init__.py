from .checkpoint import load_checkpoint, save_checkpoint
from .compile_cache import enable_compilation_cache
from .export import ExportedOp, export_op, load_exported, save_exported
from .misc import batched_forward, image_to_tensor, tensor_to_image
