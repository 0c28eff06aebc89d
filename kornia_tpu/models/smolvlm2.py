"""SmolVLM2 — exact counterpart of the reference scaffold.

Reference behavior: kornia/models/smolvlm2/smolvlm2.py:22 — the reference
itself ships a placeholder (two linear projections summed); this mirrors
it exactly (including state-dict names) so any future upstream weights
port directly. A full generative small-VLM pipeline lives in
models/vlm.py (SigLIP tower + projector + RoPE/GQA decoder with KV-cache
decode)."""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SmolVLM2", "init_params", "load_torch_weights"]


def _param_specs(vision_dim: int, text_dim: int):
    return {
        "vision_proj.weight": ("lin", (vision_dim, vision_dim)),
        "vision_proj.bias": ("raw", (vision_dim,)),
        "text_proj.weight": ("lin", (text_dim, text_dim)),
        "text_proj.bias": ("raw", (text_dim,)),
    }


def init_params(key: jax.Array, vision_dim: int = 768, text_dim: int = 768,
                dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs(vision_dim, text_dim).items():
        key, sub = jax.random.split(key)
        if kind == "lin":
            o, i = shape
            bound = 1.0 / math.sqrt(i)
            params[name] = jax.random.uniform(sub, (i, o), dtype, -bound,
                                              bound)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, vision_dim: int = 768,
                       text_dim: int = 768) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs(vision_dim, text_dim).items():
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.T) if kind == "lin" else jnp.asarray(v)
    return params


class SmolVLM2:
    def __init__(self, vision_dim: int = 768, text_dim: int = 768,
                 params=None, key: Optional[jax.Array] = None):
        self.vision_dim = vision_dim
        self.text_dim = text_dim
        self._params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    @property
    def params(self):
        if self._params is None:
            self._params = init_params(self._key, self.vision_dim,
                                       self.text_dim)
        return self._params

    def __call__(self, image_features: jax.Array,
                 text_features: jax.Array) -> jax.Array:
        p = self.params
        v = image_features @ p["vision_proj.weight"] + p["vision_proj.bias"]
        t = text_features @ p["text_proj.weight"] + p["text_proj.bias"]
        return v + t
