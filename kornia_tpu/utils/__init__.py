from .checkpoint import load_checkpoint, save_checkpoint
from .export import ExportedOp, export_op, load_exported, save_exported
from .misc import batched_forward, image_to_tensor, tensor_to_image
