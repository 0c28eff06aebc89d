"""OriNet / AffNet learned LAF refiners
(reference: kornia/feature/orientation.py:133 OriNet,
kornia/feature/affine_shape.py:161 LAFAffNetShapeEstimator).

Both nets share the same 6-conv BN(affine-free) trunk over normalized
32x32 patches; OriNet regresses a (cos-ish, sin-ish) pair -> angle,
AffNet regresses the 3 free entries of an upper-triangular-ish shape
update. Parameters live in a flat dict pytree; `from_torch` converts the
reference torch checkpoints (layout only, no torch needed at inference).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float
from .laf import (extract_patches_from_pyramid, get_laf_orientation,
                  get_laf_scale, make_upright, scale_laf,
                  set_laf_orientation)

__all__ = ["OriNet", "AffNet", "LAFAffNetShapeEstimator"]

# shared trunk: (out_ch, kernel, stride, padding), conv bias=False,
# each followed by BatchNorm2d(affine=False) + ReLU
# (reference: orientation.py:162-183 / affine_shape.py:187-208)
_TRUNK = [
    (16, 3, 1, 1),
    (16, 3, 1, 1),
    (32, 3, 2, 1),
    (32, 3, 1, 1),
    (64, 3, 2, 1),
    (64, 3, 1, 1),
]


def _init_params(key: jax.Array, head_out: int, head_pad: int,
                 dtype=jnp.float32) -> Dict:
    params = {}
    in_ch = 1
    for i, (out_ch, k, _, _) in enumerate(_TRUNK):
        key, sub = jax.random.split(key)
        fan_in = in_ch * k * k
        params[f"conv{i}_w"] = jax.random.normal(
            sub, (out_ch, in_ch, k, k), dtype) * math.sqrt(2.0 / fan_in)
        params[f"bn{i}_mean"] = jnp.zeros((out_ch,), dtype)
        params[f"bn{i}_var"] = jnp.ones((out_ch,), dtype)
        in_ch = out_ch
    key, sub = jax.random.split(key)
    params["head_w"] = jax.random.normal(
        sub, (head_out, in_ch, 8, 8), dtype) * math.sqrt(2.0 / (in_ch * 64))
    params["head_b"] = jnp.zeros((head_out,), dtype)
    return params


def _trunk_forward(params: Dict, patches: jax.Array, head_pad: int,
                   eps: float = 1e-6) -> jax.Array:
    """Normalized patches -> (B, head_out) after tanh + global mean."""
    x = as_float(patches)
    # per-patch standardization with torch's UNBIASED std
    # (reference: orientation.py:195-201 _normalize_input)
    mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    n = x.shape[1] * x.shape[2] * x.shape[3]
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True) * (n / max(n - 1, 1))
    x = (x - mu) / (jnp.sqrt(var) + eps)
    for i, (_, _, s, p) in enumerate(_TRUNK):
        x = lax.conv_general_dilated(
            x, params[f"conv{i}_w"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        mean = params[f"bn{i}_mean"].reshape(1, -1, 1, 1)
        var_i = params[f"bn{i}_var"].reshape(1, -1, 1, 1)
        x = jax.nn.relu((x - mean) / jnp.sqrt(var_i + 1e-5))
    # dropout(0.25) is identity in eval mode
    x = lax.conv_general_dilated(
        x, params["head_w"], (1, 1), [(head_pad, head_pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jnp.tanh(x + params["head_b"].reshape(1, -1, 1, 1))
    return jnp.mean(x, axis=(2, 3))  # AdaptiveAvgPool2d(1)


def _convert_torch(state_dict, n_trunk: int = len(_TRUNK)) -> Dict:
    """features.N.{weight,running_mean,running_var,bias} -> our layout."""
    import numpy as np
    items = sorted(((k, np.asarray(v)) for k, v in state_dict.items()
                    if k.split(".")[-1] in
                    ("weight", "bias", "running_mean", "running_var")),
                   key=lambda kv: ([int(p) for p in kv[0].split(".")
                                    if p.isdigit()] or [0], kv[0]))
    params: Dict = {}
    conv_i = 0
    for k, v in items:
        leaf = k.split(".")[-1]
        if leaf == "weight" and v.ndim == 4:
            name = f"conv{conv_i}_w" if conv_i < n_trunk else "head_w"
            params[name] = jnp.asarray(v)
        elif leaf == "bias" and v.ndim == 1 and conv_i >= n_trunk:
            params["head_b"] = jnp.asarray(v)
        elif leaf == "running_mean":
            params[f"bn{conv_i}_mean"] = jnp.asarray(v)
        elif leaf == "running_var":
            params[f"bn{conv_i}_var"] = jnp.asarray(v)
            conv_i += 1
    return params


def load_orinet_torch_weights(state_dict) -> Dict:
    """torch OriNet checkpoint (features.N.* layout) -> param dict."""
    return _convert_torch(state_dict)


def load_affnet_torch_weights(state_dict) -> Dict:
    """torch AffNet checkpoint (features.N.* layout) -> param dict."""
    return _convert_torch(state_dict)


class OriNet:
    """Canonical patch orientation in radians, zero pointing right
    (reference: orientation.py:133). (B, 1, 32, 32) -> (B,)."""

    patch_size = 32

    def __init__(self, params: Optional[Dict] = None, eps: float = 1e-8):
        self.params = params if params is not None else _init_params(
            jax.random.PRNGKey(0), head_out=2, head_pad=1)
        self.eps = eps

    @classmethod
    def from_torch(cls, state_dict) -> "OriNet":
        return cls(_convert_torch(state_dict))

    def __call__(self, patch: jax.Array) -> jax.Array:
        xy = _trunk_forward(self.params, patch, head_pad=1)
        return jnp.arctan2(xy[:, 0] + 1e-8, xy[:, 1] + self.eps)


class AffNet:
    """Patch-level affine-shape residual net: (B, 1, 32, 32) -> (B, 3)
    tanh outputs (reference: affine_shape.py:187-208)."""

    patch_size = 32

    def __init__(self, params: Optional[Dict] = None):
        self.params = params if params is not None else _init_params(
            jax.random.PRNGKey(1), head_out=3, head_pad=0)

    @classmethod
    def from_torch(cls, state_dict) -> "AffNet":
        return cls(_convert_torch(state_dict))

    def __call__(self, patch: jax.Array) -> jax.Array:
        return _trunk_forward(self.params, patch, head_pad=0)


class LAFAffNetShapeEstimator:
    """Replace each LAF's shape with the AffNet estimate, keeping the
    original scale (and optionally orientation)
    (reference: affine_shape.py:161 LAFAffNetShapeEstimator)."""

    def __init__(self, params: Optional[Dict] = None,
                 preserve_orientation: bool = True):
        self.net = AffNet(params)
        self.patch_size = 32
        self.preserve_orientation = preserve_orientation

    @classmethod
    def from_torch(cls, state_dict,
                   preserve_orientation: bool = True
                   ) -> "LAFAffNetShapeEstimator":
        return cls(_convert_torch(state_dict), preserve_orientation)

    def __call__(self, laf: jax.Array, img: jax.Array) -> jax.Array:
        B, N = laf.shape[:2]
        PS = self.patch_size
        patches = extract_patches_from_pyramid(img, make_upright(laf), PS)
        patches = patches.reshape(B * N, -1, PS, PS)
        if patches.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            patches = rgb_to_grayscale(patches)
        xy = self.net(patches)  # (B*N, 3)
        # A' = [[1 + x0, 0], [x1, 1 + x2]] (reference: affine_shape.py:244-247)
        a = jnp.stack([1.0 + xy[:, 0], jnp.zeros_like(xy[:, 0]),
                       xy[:, 1], 1.0 + xy[:, 2]], axis=-1)
        new_lin = a.reshape(B, N, 2, 2)
        new_laf = jnp.concatenate([new_lin, laf[..., :, 2:3]], axis=-1)
        scale_orig = get_laf_scale(laf)
        ellipse_scale = get_laf_scale(new_laf)
        laf_out = scale_laf(make_upright(new_laf),
                            scale_orig / ellipse_scale)
        if self.preserve_orientation:
            laf_out = set_laf_orientation(laf_out, get_laf_orientation(laf))
        return laf_out
