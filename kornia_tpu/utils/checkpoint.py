"""Checkpointing via orbax (SURVEY.md §5: the reference has none beyond
torch.hub weight loading; the TPU build checkpoints model params and
BA/map state for restartable multi-host jobs).
"""

from __future__ import annotations

import os
from typing import Any, Optional


__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (params, optimizer state, BA map, ...) to `path`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved by save_checkpoint; `target` provides the
    structure/shapes (required for typed restore)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if target is not None:
        return ckpt.restore(path, target)
    return ckpt.restore(path)
