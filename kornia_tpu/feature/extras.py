"""Remaining reference feature-API surface: HardNet8, FRN/TLU layers,
response-module wrappers, geometry-aware matchers, LAF descriptor helper
(reference: kornia/feature/hardnet.py:121, hynet.py:29,125,
matching.py:540, integrated.py:47, adalam/adalam.py:50)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check_laf as KORNIA_CHECK_LAF  # noqa: F401
from ..core.dtype import as_float
from ..core.module import fn_module as _fn_module
from . import responses as _resp
from .matching import distance_matrix, match_fginn, match_smnn

__all__ = [
    "HardNet8", "hardnet8_init_params", "load_hardnet8_torch_weights",
    "FilterResponseNorm2d", "TLU",
    "CornerHarris", "CornerGFTT", "BlobHessian", "BlobDoG", "BlobDoGSingle",
    "ALIKEDFeatures", "InterpolateSparse2d", "XFeatModel",
    "PatchDominantGradientOrientation",
    "get_laf_descriptors", "GeometryAwareDescriptorMatcher", "match_adalam",
    "LightGlueMatcher", "KORNIA_CHECK_LAF",
]

# (out_ch, kernel, stride, pad); BN affine=False + ReLU after each but last
# (reference: hardnet.py:148-173)
_HARDNET8_ARCH = [
    (32, 3, 1, 1), (32, 3, 1, 1), (64, 3, 2, 1), (64, 3, 1, 1),
    (128, 3, 2, 1), (128, 3, 1, 1), (256, 3, 1, 1), (512, 8, 1, 0),
]


def hardnet8_init_params(key: jax.Array, dtype=jnp.float32) -> Dict:
    params = {}
    in_ch = 1
    for i, (out_ch, k, _s, _p) in enumerate(_HARDNET8_ARCH):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (out_ch, in_ch, k, k), dtype) * jnp.sqrt(
            2.0 / (in_ch * k * k))
        params[f"conv{i}_w"] = w
        params[f"bn{i}_mean"] = jnp.zeros((out_ch,), dtype)
        params[f"bn{i}_var"] = jnp.ones((out_ch,), dtype)
        in_ch = out_ch
    # learned PCA buffers (reference: hardnet.py:175-176)
    params["pca_mean"] = jnp.zeros((512,), dtype)
    params["pca_components"] = jnp.eye(512, 128, dtype=dtype)
    return params


def load_hardnet8_torch_weights(state_dict) -> Dict:
    """Port a torch HardNet8 checkpoint (reference layout:
    features.{0,3,6,...}.weight convs + BN running stats + mean/components
    buffers)."""
    import numpy as np
    t = {k: jnp.asarray(np.asarray(v)) for k, v in state_dict.items()}
    conv_layers = sorted(
        (int(k.split(".")[1]) for k in t
         if k.startswith("features.") and k.endswith(".weight")
         and t[k].ndim == 4))
    params = {}
    for conv_i, idx in enumerate(conv_layers):
        params[f"conv{conv_i}_w"] = t[f"features.{idx}.weight"]
        params[f"bn{conv_i}_mean"] = t[f"features.{idx + 1}.running_mean"]
        params[f"bn{conv_i}_var"] = t[f"features.{idx + 1}.running_var"]
    params["pca_mean"] = t["mean"]
    params["pca_components"] = t["components"]
    return params


class HardNet8:
    """HardNet8 descriptor: 8-conv trunk + learned PCA to 128-D
    (reference: hardnet.py:121). (B, 1, 32, 32) → (B, 128)."""

    patch_size = 32

    def __init__(self, params: Optional[Dict] = None):
        self.params = params if params is not None else \
            hardnet8_init_params(jax.random.PRNGKey(8))

    def __call__(self, patches: jax.Array) -> jax.Array:
        p = self.params
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(x, axis=(1, 2, 3), keepdims=True)
        x = (x - lax.stop_gradient(mu)) / (lax.stop_gradient(sd) + 1e-7)
        n = len(_HARDNET8_ARCH)
        for i, (_out, _k, s, pad) in enumerate(_HARDNET8_ARCH):
            x = lax.conv_general_dilated(
                x, p[f"conv{i}_w"], (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            mean = p[f"bn{i}_mean"].reshape(1, -1, 1, 1)
            var = p[f"bn{i}_var"].reshape(1, -1, 1, 1)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
            if i < n - 1:
                x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        pca = (x - p["pca_mean"]) @ p["pca_components"]
        return pca / jnp.maximum(
            jnp.linalg.norm(pca, axis=1, keepdims=True), 1e-12)

    forward = __call__


class FilterResponseNorm2d:
    """y = gamma * x / sqrt(E[x²] + |eps|) + beta (reference: hynet.py:29)."""

    def __init__(self, num_features: int, eps: float = 1e-6,
                 is_bias: bool = True, is_scale: bool = True,
                 drop_rate: float = 0.0, is_eps_leanable: bool = False):
        self.num_features = num_features
        self.eps = jnp.asarray(eps)
        self.is_bias = is_bias
        self.is_scale = is_scale
        self.weight = jnp.ones((1, num_features, 1, 1))
        self.bias = jnp.zeros((1, num_features, 1, 1))

    def __call__(self, x: jax.Array) -> jax.Array:
        x = as_float(x)
        nu2 = jnp.mean(x * x, axis=(2, 3), keepdims=True)
        x = x * jax.lax.rsqrt(nu2 + jnp.abs(self.eps))
        if self.is_scale:
            x = self.weight * x
        if self.is_bias:
            x = x + self.bias
        return x

    forward = __call__


class TLU:
    """y = max(x, tau), learnable per-channel tau (reference: hynet.py:125)."""

    def __init__(self, num_features: int):
        self.num_features = num_features
        self.tau = -jnp.ones((1, num_features, 1, 1))

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.maximum(as_float(x), self.tau)

    forward = __call__


# response-module wrappers (reference: responses.py CornerHarris etc.)
CornerHarris = _fn_module(_resp.harris_response, "CornerHarris")
CornerGFTT = _fn_module(_resp.gftt_response, "CornerGFTT")
BlobHessian = _fn_module(_resp.hessian_response, "BlobHessian")
BlobDoG = _fn_module(_resp.dog_response, "BlobDoG")
BlobDoGSingle = _fn_module(_resp.dog_response_single, "BlobDoGSingle")


@dataclasses.dataclass
class ALIKEDFeatures:
    """Per-image ALIKED output container (reference: aliked/aliked.py:77)."""

    keypoints: jax.Array
    descriptors: jax.Array
    keypoint_scores: jax.Array


class InterpolateSparse2d:
    """Bilinear/bicubic sampling of a feature map at sparse normalized
    positions (reference: xfeat.py InterpolateSparse2d)."""

    def __init__(self, mode: str = "bicubic", align_corners: bool = False):
        self.mode = mode
        self.align_corners = align_corners

    def __call__(self, x: jax.Array, pos: jax.Array, H: int, W: int
                 ) -> jax.Array:
        from .xfeat import _interpolate_sparse2d
        return _interpolate_sparse2d(x, pos, H, W, self.mode)

    forward = __call__


class XFeatModel:
    """Raw XFeat backbone as a callable module (reference: xfeat.py
    XFeatModel). Returns (feats (B, 64, H/8, W/8), keypoint logits,
    heatmap)."""

    def __init__(self, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None):
        from .xfeat import xfeat_init_params
        if params is None:
            params = xfeat_init_params(key if key is not None
                                       else jax.random.PRNGKey(0))
        self.params = params

    def __call__(self, images: jax.Array):
        from .xfeat import xfeat_model
        return xfeat_model(self.params, as_float(images))

    forward = __call__


class PatchDominantGradientOrientation:
    """Module over patch_dominant_gradient_orientation
    (reference: orientation.py PatchDominantGradientOrientation)."""

    def __init__(self, patch_size: int = 32, num_angular_bins: int = 36):
        self.patch_size = patch_size
        self.num_angular_bins = num_angular_bins

    def __call__(self, patch: jax.Array) -> jax.Array:
        from .orientation import patch_dominant_gradient_orientation
        return patch_dominant_gradient_orientation(
            patch, self.num_angular_bins)

    forward = __call__


def get_laf_descriptors(img: jax.Array, lafs: jax.Array, patch_descriptor,
                        patch_size: int = 32,
                        grayscale_descriptor: bool = True) -> jax.Array:
    """Extract patches at LAFs and describe them
    (reference: integrated.py:47)."""
    KORNIA_CHECK_LAF(lafs)
    from .laf import extract_patches_from_pyramid
    timg = as_float(img)
    if grayscale_descriptor and timg.shape[1] == 3:
        from ..ops.color import rgb_to_grayscale
        timg = rgb_to_grayscale(timg)
    patches = extract_patches_from_pyramid(timg, lafs, patch_size)
    B, N, CH, H, W = patches.shape
    return patch_descriptor(patches.reshape(B * N, CH, H, W)).reshape(
        B, N, -1)


def match_adalam(desc1: jax.Array, desc2: jax.Array, lafs1: jax.Array,
                 lafs2: jax.Array, config: Optional[dict] = None,
                 hw1: Optional[Tuple[int, int]] = None,
                 hw2: Optional[Tuple[int, int]] = None,
                 dm: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """SMNN matching + AdaLAM local-affine-consistency filtering
    (reference: adalam/adalam.py:50). TPU shape policy: returns fixed-size
    (N1, 1) distances and (N1, 2) index pairs where filtered-out rows carry
    distance inf and index -1 (padded static shape instead of the
    reference's dynamic B3)."""
    from .adalam import adalam_filter
    from .laf import get_laf_center
    config = config or {}
    del dm  # precomputed distance matrices are recomputed here (cheap on MXU)
    dists, idxs, valid = match_smnn(
        desc1, desc2, th=float(config.get("th", 0.95)))
    kp1 = get_laf_center(lafs1)[0]
    kp2 = get_laf_center(lafs2)[0]
    kp0m = kp1[idxs[:, 0]]
    kp1m = kp2[idxs[:, 1]]
    keep = adalam_filter(
        kp0m, kp1m, valid,
        num_seeds=int(config.get("num_seeds", 64)),
        inlier_th=float(config.get("inlier_th", 10.0)),
        min_support=int(config.get("min_confidence", 4)))
    dists = jnp.where(keep[:, None], dists, jnp.inf)
    idxs = jnp.where(keep[:, None], idxs, -1)
    return dists, idxs


class GeometryAwareDescriptorMatcher:
    """LAF-aware matcher: 'fginn' or 'adalam'
    (reference: matching.py:540)."""

    known_modes = ("fginn", "adalam")

    def __init__(self, match_mode: str = "fginn",
                 params: Optional[dict] = None):
        mode = match_mode.lower()
        if mode not in self.known_modes:
            raise NotImplementedError(
                f"{match_mode} not supported; use one of {self.known_modes}")
        self.match_mode = mode
        self.params = params or {}

    def __call__(self, desc1, desc2, lafs1, lafs2):
        if self.match_mode == "fginn":
            out = match_fginn(desc1, desc2, lafs1, lafs2, **self.params)
            return out[0], out[1]
        return match_adalam(desc1, desc2, lafs1, lafs2, self.params)

    forward = __call__


class LightGlueMatcher(GeometryAwareDescriptorMatcher):
    """LightGlue as a LAF-interface matcher (reference:
    integrated.py:490)."""

    known_modes = ("lightglue",)

    def __init__(self, feature_name: str = "disk",
                 params: Optional[dict] = None):
        self.feature_name = feature_name
        self.params = params or {}
        self.match_mode = "lightglue"
        from .lightglue import LightGlue, LightGlueConfig
        cfg = self.params.get("cfg") or LightGlueConfig()
        self.matcher = LightGlue(cfg, params=self.params.get("weights"))

    def __call__(self, desc1, desc2, lafs1, lafs2, hw1=None, hw2=None):
        from .laf import get_laf_center
        kp1 = get_laf_center(lafs1)
        kp2 = get_laf_center(lafs2)
        if hw1 is None:
            hw1 = (int(jnp.max(kp1[..., 1])) + 1, int(jnp.max(kp1[..., 0])) + 1)
        if hw2 is None:
            hw2 = (int(jnp.max(kp2[..., 1])) + 1, int(jnp.max(kp2[..., 0])) + 1)
        size1 = jnp.array([hw1[1], hw1[0]], jnp.float32)
        size2 = jnp.array([hw2[1], hw2[0]], jnp.float32)
        out = self.matcher({
            "image0": {"keypoints": kp1, "descriptors": desc1[None],
                       "image_size": size1},
            "image1": {"keypoints": kp2, "descriptors": desc2[None],
                       "image_size": size2},
        })
        matches = out["matches0"][0]  # (N1,) index into kp2 or -1
        scores = out["matching_scores0"][0]
        n1 = matches.shape[0]
        idxs = jnp.stack([jnp.arange(n1), matches], axis=-1)
        valid = matches >= 0
        dists = jnp.where(valid, 1.0 - scores, jnp.inf)[:, None]
        idxs = jnp.where(valid[:, None], idxs, -1)
        return dists, idxs
