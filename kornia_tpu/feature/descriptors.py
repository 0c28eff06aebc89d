"""Additional patch descriptors and shape estimators
(reference: kornia/feature/ — tfeat.py, sosnet.py, hynet.py:302,
mkd.py:713, affine_shape.py:247, keynet.py:227, steerers.py:25).

All CNNs are pure-jax parameter dicts (like HardNet) so torch checkpoints
convert by layout only.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float
from ..ops.filters import get_gaussian_kernel2d, spatial_gradient

__all__ = ["TFeat", "SOSNet", "HyNet", "MKDGradientDescriptor",
           "PatchAffineShapeEstimator", "LAFAffineShapeEstimator", "KeyNet",
           "DiscreteSteerer"]


def _conv(params, name, x, stride=1, padding=1):
    w = params[f"{name}_w"]
    b = params.get(f"{name}_b")
    out = lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _bn(params, name, x):
    mean = params[f"{name}_mean"].reshape(1, -1, 1, 1)
    var = params[f"{name}_var"].reshape(1, -1, 1, 1)
    out = (x - mean) / jnp.sqrt(var + 1e-5)
    if f"{name}_g" in params:
        out = out * params[f"{name}_g"].reshape(1, -1, 1, 1) + \
            params[f"{name}_beta"].reshape(1, -1, 1, 1)
    return out


def _init_conv(key, params, name, cin, cout, k, bias=False, bn=True):
    key, sub = jax.random.split(key)
    params[f"{name}_w"] = jax.random.normal(
        sub, (cout, cin, k, k)) * math.sqrt(2.0 / (cin * k * k))
    if bias:
        params[f"{name}_b"] = jnp.zeros(cout)
    if bn:
        params[f"{name}_mean"] = jnp.zeros(cout)
        params[f"{name}_var"] = jnp.ones(cout)
    return key


class TFeat:
    """Shallow 32x32→128 descriptor (reference: feature/tfeat.py)."""

    def __init__(self, params: Optional[Dict] = None):
        if params is None:
            params = {}
            key = jax.random.PRNGKey(0)
            key = _init_conv(key, params, "c1", 1, 32, 7, bias=True, bn=False)
            key = _init_conv(key, params, "c2", 32, 64, 6, bias=True, bn=False)
            key, sub = jax.random.split(key)
            params["fc_w"] = jax.random.normal(sub, (128, 64 * 8 * 8)) * 0.01
            params["fc_b"] = jnp.zeros(128)
        self.params = params

    def __call__(self, patches: jax.Array) -> jax.Array:
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        p = self.params
        x = jnp.tanh(_conv(p, "c1", x, stride=1, padding=0))
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
        x = jnp.tanh(_conv(p, "c2", x, stride=1, padding=0))
        x = x.reshape(x.shape[0], -1)
        x = jnp.tanh(x @ p["fc_w"].T + p["fc_b"])
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


_SOS_ARCH = [(32, 1, 1), (32, 1, 1), (64, 2, 1), (64, 1, 1), (128, 2, 1),
             (128, 1, 1)]


class SOSNet:
    """HardNet-topology descriptor trained with SOS regularization
    (reference: feature/sosnet.py) — same forward as HardNet."""

    def __init__(self, params: Optional[Dict] = None):
        if params is None:
            params = {}
            key = jax.random.PRNGKey(1)
            cin = 1
            for i, (cout, s, p_) in enumerate(_SOS_ARCH):
                key = _init_conv(key, params, f"c{i}", cin, cout, 3)
                cin = cout
            key = _init_conv(key, params, "c6", 128, 128, 8)
        self.params = params

    def __call__(self, patches: jax.Array) -> jax.Array:
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        mu = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(x, axis=(1, 2, 3), keepdims=True)
        x = (x - mu) / (sd + 1e-7)
        p = self.params
        for i, (cout, s, pad) in enumerate(_SOS_ARCH):
            x = jax.nn.relu(_bn(p, f"c{i}", _conv(p, f"c{i}", x, s, pad)))
        x = _bn(p, "c6", _conv(p, "c6", x, 1, 0))
        x = x.reshape(x.shape[0], -1)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class HyNet(SOSNet):
    """(reference: feature/hynet.py:302) — HardNet topology with FRN-style
    normalization approximated by BN in inference; weight port maps FRN
    scale/bias into the affine BN slots."""

    def __init__(self, params: Optional[Dict] = None):
        if params is None:
            super().__init__(None)
        else:
            self.params = params


class MKDGradientDescriptor:
    """Multiple-kernel-descriptor lite: polar gradient embedding + whitening
    (reference: feature/mkd.py:713 — the explicit kernel feature map;
    the learned whitening matrix ports from the reference checkpoint)."""

    def __init__(self, patch_size: int = 32, output_dims: int = 128,
                 whitening: Optional[jax.Array] = None):
        self.patch_size = patch_size
        self.output_dims = output_dims
        self.whitening = whitening

    def __call__(self, patches: jax.Array) -> jax.Array:
        x = as_float(patches)
        B, C, H, W = x.shape
        grads = spatial_gradient(x, "diff")
        gx = grads[:, :, 0]
        gy = grads[:, :, 1]
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-10)
        ori = jnp.arctan2(gy, gx)
        gk = get_gaussian_kernel2d((H, W), (H / 3.0, W / 3.0), x.dtype)[0]
        mag = mag * gk[None, None]
        # embed orientation into harmonics, position into polar harmonics
        ys = jnp.linspace(-1, 1, H)
        xs = jnp.linspace(-1, 1, W)
        gyy, gxx = jnp.meshgrid(ys, xs, indexing="ij")
        rho = jnp.sqrt(gxx**2 + gyy**2 + 1e-10)
        phi = jnp.arctan2(gyy, gxx)
        feats = []
        for k_ori in range(1, 4):
            for trig_o in (jnp.cos, jnp.sin):
                o_emb = trig_o(k_ori * ori) * mag
                for k_pos in range(3):
                    for trig_p in (jnp.cos, jnp.sin):
                        p_emb = trig_p(k_pos * phi) * jnp.exp(-2.0 * rho)
                        feats.append(jnp.sum(o_emb * p_emb[None, None],
                                             axis=(-2, -1)))
        f = jnp.concatenate(feats, axis=-1)  # (B, C*36)
        f = f.reshape(B, -1)
        if self.whitening is not None:
            f = f @ self.whitening[: f.shape[-1], : self.output_dims]
        else:
            # fixed random projection to output_dims (deterministic)
            key = jax.random.PRNGKey(12)
            proj = jax.random.normal(key, (f.shape[-1], self.output_dims))
            proj = proj / jnp.linalg.norm(proj, axis=0, keepdims=True)
            f = f @ proj
        return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)


class PatchAffineShapeEstimator:
    """Second-moment-matrix affine shape of a patch
    (reference: affine_shape.py PatchAffineShapeEstimator)."""

    def __init__(self, patch_size: int = 19):
        self.patch_size = patch_size

    def __call__(self, patches: jax.Array) -> jax.Array:
        """(B, 1, PS, PS) → (B, 3): (a, b, c) of the ellipse matrix."""
        x = as_float(patches)
        B, C, H, W = x.shape
        grads = spatial_gradient(x, "diff")
        gx = grads[:, 0, 0]
        gy = grads[:, 0, 1]
        gk = get_gaussian_kernel2d((H, W), (H / 3.0, W / 3.0), x.dtype)[0]
        a = jnp.sum(gx * gx * gk, axis=(-2, -1))
        b = jnp.sum(gx * gy * gk, axis=(-2, -1))
        c = jnp.sum(gy * gy * gk, axis=(-2, -1))
        norm = jnp.maximum(jnp.sqrt(a * c - b * b + 1e-10), 1e-10)
        return jnp.stack([a, b, c], -1) / norm[:, None]


class LAFAffineShapeEstimator:
    """Update LAF linear parts from patch second moments
    (reference: affine_shape.py:247 LAFAffineShapeEstimator)."""

    def __init__(self, patch_size: int = 32):
        self.patch_size = patch_size
        self.estimator = PatchAffineShapeEstimator(patch_size)

    def __call__(self, laf: jax.Array, img: jax.Array) -> jax.Array:
        from .laf import (extract_patches_from_pyramid, get_laf_scale,
                          make_upright, set_laf_scale)
        B, N = laf.shape[:2]
        patches = extract_patches_from_pyramid(img, laf, self.patch_size)
        flat = patches.reshape(B * N, *patches.shape[2:])
        if flat.shape[1] == 3:
            from ..ops.color import rgb_to_grayscale
            flat = rgb_to_grayscale(flat)
        abc = self.estimator(flat).reshape(B, N, 3)
        # inverse sqrt of the second-moment matrix = shape-adapted frame
        a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]
        M = jnp.stack([jnp.stack([a, b], -1), jnp.stack([b, c], -1)], -2)
        vals, vecs = jnp.linalg.eigh(M)
        inv_sqrt = vecs @ (
            (1.0 / jnp.sqrt(jnp.maximum(vals, 1e-9)))[..., None]
            * jnp.swapaxes(vecs, -1, -2))
        det = jnp.linalg.det(inv_sqrt)[..., None, None]
        inv_sqrt = inv_sqrt / jnp.sqrt(jnp.maximum(det, 1e-9))
        A_new = laf[..., :2, :2] @ inv_sqrt
        out = jnp.concatenate([A_new, laf[..., :2, 2:]], axis=-1)
        return make_upright(out)


class KeyNet:
    """Learned keypoint response (reference: feature/keynet.py:227):
    handcrafted gradient features + small conv stack → response map."""

    def __init__(self, params: Optional[Dict] = None, num_filters: int = 8,
                 num_levels: int = 3):
        self.num_filters = num_filters
        self.num_levels = num_levels
        if params is None:
            params = {}
            key = jax.random.PRNGKey(3)
            cin = 10  # handcrafted feature channels
            for i in range(num_levels):
                key = _init_conv(key, params, f"c{i}", cin, num_filters, 5)
                cin = num_filters
            key = _init_conv(key, params, "out", num_filters, 1, 5, bias=True,
                             bn=False)
        self.params = params

    def _handcrafted(self, x: jax.Array) -> jax.Array:
        g = spatial_gradient(x, "sobel", 1)
        gx, gy = g[:, :, 0], g[:, :, 1]
        g2 = spatial_gradient(x, "sobel", 2)
        gxx, gxy, gyy = g2[:, :, 0], g2[:, :, 1], g2[:, :, 2]
        feats = [gx, gy, gx * gy, gx * gx, gy * gy, gxx, gyy, gxy,
                 gxx * gyy, gx * gx * gy * gy]
        return jnp.concatenate(feats, axis=1)

    def __call__(self, x: jax.Array, sigmas=None) -> jax.Array:
        x = as_float(x)
        h = self._handcrafted(x)
        p = self.params
        for i in range(self.num_levels):
            h = jax.nn.relu(_bn(p, f"c{i}", _conv(p, f"c{i}", h, 1, 2)))
        out = _conv(p, "out", h, 1, 2)
        if sigmas is not None:
            s = jnp.reshape(sigmas, (-1, 1, 1, 1))
            out = out * (s * s)
        return jax.nn.relu(out)


class DiscreteSteerer:
    """Rotation-steerable descriptor transform (reference:
    feature/steerers.py:25): desc' = G @ desc for a learned generator G."""

    def __init__(self, generator: jax.Array):
        self.generator = generator

    def __call__(self, descriptions: jax.Array) -> jax.Array:
        return descriptions @ self.generator.T

    def steer_descriptions(self, descriptions: jax.Array,
                           steerer_power: int = 1,
                           normalize: bool = False) -> jax.Array:
        out = descriptions
        for _ in range(steerer_power):
            out = self(out)
        if normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-8)
        return out
