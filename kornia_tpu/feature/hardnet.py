"""HardNet patch descriptor (reference: kornia/feature/hardnet.py:225).

Pure-JAX CNN over (B, 1, 32, 32) patches → (B, 128) L2-normalized
descriptors. Parameters are a flat dict pytree; `load_torch_weights`
converts a torch state_dict (the reference's pretrained checkpoint) —
layout conversion only, no torch dependency at inference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["HardNet", "hardnet_init_params", "load_torch_weights"]

# (out_ch, kernel, stride, padding) per conv layer — reference architecture
_ARCH = [
    (32, 3, 1, 1),
    (32, 3, 1, 1),
    (64, 3, 2, 1),
    (64, 3, 1, 1),
    (128, 3, 2, 1),
    (128, 3, 1, 1),
    (128, 8, 1, 0),  # final 8x8 conv → 1x1
]


def hardnet_init_params(key: jax.Array, dtype=jnp.float32) -> Dict:
    params = {}
    in_ch = 1
    for i, (out_ch, k, s, p) in enumerate(_ARCH):
        key, sub = jax.random.split(key)
        fan_in = in_ch * k * k
        w = jax.random.normal(sub, (out_ch, in_ch, k, k), dtype) * jnp.sqrt(
            2.0 / fan_in)
        params[f"conv{i}_w"] = w
        # affine-free batchnorm statistics (running mean/var)
        params[f"bn{i}_mean"] = jnp.zeros((out_ch,), dtype)
        params[f"bn{i}_var"] = jnp.ones((out_ch,), dtype)
        in_ch = out_ch
    return params


def _hardnet_forward(params: Dict, patches: jax.Array) -> jax.Array:
    x = as_float(patches)
    # input norm: per-patch standardization (reference input_norm)
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    sd = jnp.std(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mu) / (sd + 1e-7)
    n_layers = len(_ARCH)
    for i, (out_ch, k, s, p) in enumerate(_ARCH):
        w = params[f"conv{i}_w"]
        x = lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        mean = params[f"bn{i}_mean"].reshape(1, -1, 1, 1)
        var = params[f"bn{i}_var"].reshape(1, -1, 1, 1)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class HardNet:
    """Callable descriptor; (B, 1, 32, 32) → (B, 128)."""

    def __init__(self, params: Optional[Dict] = None):
        self.params = params if params is not None else hardnet_init_params(
            jax.random.PRNGKey(42))

    def __call__(self, patches: jax.Array) -> jax.Array:
        if patches.shape[-1] != 32:
            from ..ops.warp import resize
            patches = resize(patches, (32, 32))
        return _hardnet_forward(self.params, patches)


def load_torch_weights(state_dict) -> Dict:
    """Convert the reference HardNet torch state_dict (features.N.*) into
    our param dict. Accepts numpy-convertible tensors."""
    import numpy as np
    params = {}
    conv_i = 0
    keys = sorted(state_dict.keys(), key=_torch_key_order)
    for k in keys:
        v = np.asarray(state_dict[k])
        if k.endswith("weight") and v.ndim == 4:
            params[f"conv{conv_i}_w"] = jnp.asarray(v)
        elif k.endswith("running_mean"):
            params[f"bn{conv_i}_mean"] = jnp.asarray(v)
        elif k.endswith("running_var"):
            params[f"bn{conv_i}_var"] = jnp.asarray(v)
            conv_i += 1
    return params


def _torch_key_order(k: str):
    parts = k.split(".")
    nums = [int(p) for p in parts if p.isdigit()]
    return (nums[0] if nums else 0, k)
