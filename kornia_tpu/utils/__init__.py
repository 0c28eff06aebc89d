from .export import ExportedOp, export_op, load_exported, save_exported
from .checkpoint import load_checkpoint, save_checkpoint
