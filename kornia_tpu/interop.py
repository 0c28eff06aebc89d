"""Framework interop (the analogue of the reference's transpiler,
kornia/transpiler/transpiler.py:26-80 to_jax/to_numpy/to_tensorflow —
which transpiles TORCH kornia into other frameworks via ivy. This build IS
native JAX, so interop reduces to zero-copy tensor bridges and state-dict
conversion).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["from_torch", "to_torch", "to_numpy", "torch_state_dict_to_pytree"]


def from_torch(tensor) -> jax.Array:
    """torch.Tensor → jax.Array (zero-copy via dlpack when possible)."""
    try:
        return jnp.from_dlpack(tensor)
    except Exception:
        return jnp.asarray(tensor.detach().cpu().numpy())


def to_torch(array: jax.Array):
    """jax.Array → torch.Tensor."""
    import torch
    try:
        return torch.from_dlpack(array)
    except Exception:
        return torch.from_numpy(np.asarray(array))


def to_numpy(array: jax.Array) -> np.ndarray:
    return np.asarray(array)


def torch_state_dict_to_pytree(state_dict: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Flat torch state_dict → flat jax param dict (values converted;
    names preserved — model-specific layout mapping lives with each model,
    e.g. feature/hardnet.py load_torch_weights)."""
    return {k: jnp.asarray(np.asarray(v.detach().cpu().numpy())
                           if hasattr(v, "detach") else np.asarray(v))
            for k, v in state_dict.items()}
