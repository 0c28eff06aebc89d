"""Additional patch descriptors and shape estimators
(reference: kornia/feature/ — tfeat.py, sosnet.py, hynet.py:302,
mkd.py:713, affine_shape.py:247, keynet.py:227, steerers.py:25).

All CNNs are pure-jax parameter dicts (like HardNet) so torch checkpoints
convert by layout only.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

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


def _instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch InstanceNorm2d(affine=False) on NCHW: per-sample per-channel
    standardization with biased variance."""
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps)


def _lrn_l2(x: jax.Array) -> jax.Array:
    """torch LocalResponseNorm(2C, alpha=2C, beta=0.5, k=0) on (B, C, 1, 1):
    the window covers every channel, so it reduces to global L2
    normalization over the channel axis (reference: sosnet.py desc_norm,
    hynet.py desc_norm)."""
    return x * lax.rsqrt(jnp.sum(x * x, axis=1, keepdims=True))


def _convert_torch(state_dict, specs) -> Dict[str, jax.Array]:
    """torch state-dict -> param dict with identical keys; conv weights
    (O,I,kH,kW) stay OIHW (these nets run tiny 32x32 patches where XLA's
    layout assignment handles the transpose once at compile time)."""
    import numpy as np

    params: Dict[str, jax.Array] = {}
    for k, shape in specs.items():
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v)
    return params


def _init_from_specs(key, specs) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, shape in specs.items():
        key, sub = jax.random.split(key)
        if name.endswith("running_var"):
            params[name] = jnp.ones(shape)
        elif name.endswith(".tau"):
            params[name] = -jnp.ones(shape)
        elif name.endswith(".eps"):
            params[name] = jnp.full(shape, 1e-6)
        elif len(shape) >= 2:  # conv / linear weights
            fan_in = int(jnp.prod(jnp.asarray(shape[1:])))
            params[name] = jax.random.normal(sub, shape) * math.sqrt(
                2.0 / fan_in)
        elif name.endswith(".weight"):  # norm scales
            params[name] = jnp.ones(shape)
        else:
            params[name] = jnp.zeros(shape)
    return params


def _tconv(p, name, x, stride=1, padding=0):
    """NCHW conv with torch-layout OIHW weights + optional bias."""
    w = p[f"{name}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b.astype(x.dtype).reshape(1, -1, 1, 1)


def _tbn(p, name, x, affine=True):
    mean = p[f"{name}.running_mean"].astype(x.dtype).reshape(1, -1, 1, 1)
    var = p[f"{name}.running_var"].astype(x.dtype).reshape(1, -1, 1, 1)
    y = (x - mean) * lax.rsqrt(var + 1e-5)
    if affine:
        y = y * p[f"{name}.weight"].astype(x.dtype).reshape(1, -1, 1, 1) \
            + p[f"{name}.bias"].astype(x.dtype).reshape(1, -1, 1, 1)
    return y


class TFeat:
    """Exact TFeat descriptor (reference: feature/tfeat.py:31-87):
    InstanceNorm → conv7 → tanh → maxpool2 → conv6 → tanh → linear → tanh.
    (B, 1, 32, 32) → (B, 128); torch checkpoints load via
    `TFeat.from_torch`."""

    patch_size = 32
    _SPECS = {
        "features.1.weight": (32, 1, 7, 7), "features.1.bias": (32,),
        "features.4.weight": (64, 32, 6, 6), "features.4.bias": (64,),
        "descr.0.weight": (128, 64 * 8 * 8), "descr.0.bias": (128,),
    }

    def __init__(self, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None):
        self.params = params if params is not None else _init_from_specs(
            key if key is not None else jax.random.PRNGKey(0), self._SPECS)

    @classmethod
    def from_torch(cls, state_dict) -> "TFeat":
        return cls(_convert_torch(state_dict, cls._SPECS))

    def __call__(self, patches: jax.Array) -> jax.Array:
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        p = self.params
        x = _instance_norm(x)
        x = jnp.tanh(_tconv(p, "features.1", x))
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2),
                              (1, 1, 2, 2), "VALID")
        x = jnp.tanh(_tconv(p, "features.4", x))
        x = x.reshape(x.shape[0], -1)
        return jnp.tanh(x @ p["descr.0.weight"].T.astype(x.dtype)
                        + p["descr.0.bias"].astype(x.dtype))


# (conv layer idx, bn layer idx, out, stride)
_SOS_LAYERS = ((1, 2, 32, 1), (4, 5, 32, 1), (7, 8, 64, 2), (10, 11, 64, 1),
               (13, 14, 128, 2), (16, 17, 128, 1))


class SOSNet:
    """Exact SOSNet descriptor (reference: feature/sosnet.py:30-98):
    InstanceNorm → 6×(conv3 → BN(no affine) → ReLU) → conv8 → BN →
    LRN-as-L2. (B, 1, 32, 32) → (B, 128); `SOSNet.from_torch` for
    checkpoints."""

    patch_size = 32

    @classmethod
    def _specs(cls) -> Dict[str, Tuple[int, ...]]:
        specs: Dict[str, Tuple[int, ...]] = {}
        cin = 1
        for ci, bi, cout, _s in _SOS_LAYERS:
            specs[f"layers.{ci}.weight"] = (cout, cin, 3, 3)
            specs[f"layers.{bi}.running_mean"] = (cout,)
            specs[f"layers.{bi}.running_var"] = (cout,)
            cin = cout
        specs["layers.20.weight"] = (128, 128, 8, 8)
        specs["layers.21.running_mean"] = (128,)
        specs["layers.21.running_var"] = (128,)
        return specs

    def __init__(self, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None):
        self.params = params if params is not None else _init_from_specs(
            key if key is not None else jax.random.PRNGKey(1), self._specs())

    @classmethod
    def from_torch(cls, state_dict) -> "SOSNet":
        return cls(_convert_torch(state_dict, cls._specs()))

    def __call__(self, patches: jax.Array, eps: float = 1e-10) -> jax.Array:
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        p = self.params
        x = _instance_norm(x)
        for ci, bi, _cout, s in _SOS_LAYERS:
            x = jax.nn.relu(_tbn(p, f"layers.{bi}",
                                 _tconv(p, f"layers.{ci}", x, s, 1),
                                 affine=False))
        x = _tbn(p, "layers.21", _tconv(p, "layers.20", x), affine=False)
        return _lrn_l2(x + eps).reshape(x.shape[0], -1)


def _frn(p, name, x):
    """FilterResponseNorm2d (reference: hynet.py:30-127):
    x·rsqrt(E[x²]_HW + |eps|)·w + b."""
    nu2 = jnp.mean(x * x, axis=(-2, -1), keepdims=True)
    y = x * lax.rsqrt(nu2 + jnp.abs(p[f"{name}.eps"]).astype(x.dtype))
    return y * p[f"{name}.weight"].astype(x.dtype) \
        + p[f"{name}.bias"].astype(x.dtype)


def _tlu(p, name, x):
    """TLU: max(x, tau) with learnable per-channel tau (hynet.py:130-185)."""
    return jnp.maximum(x, p[f"{name}.tau"].astype(x.dtype))


# layerN -> (conv idx within the Sequential, cin, cout, stride)
_HYNET_LAYERS = (("layer2", 0, 32, 32, 1), ("layer3", 0, 32, 64, 2),
                 ("layer4", 0, 64, 64, 1), ("layer5", 0, 64, 128, 2),
                 ("layer6", 0, 128, 128, 1))


class HyNet:
    """Exact HyNet descriptor (reference: feature/hynet.py:188-302):
    FRN/TLU-normalized conv stack → conv8 → BN → LRN-as-L2.
    (B, 1, 32, 32) → (B, 128); `HyNet.from_torch` for checkpoints."""

    patch_size = 32

    @classmethod
    def _specs(cls) -> Dict[str, Tuple[int, ...]]:
        def frn(prefix: str, ch: int, specs) -> None:
            specs[f"{prefix}.weight"] = (1, ch, 1, 1)
            specs[f"{prefix}.bias"] = (1, ch, 1, 1)
            specs[f"{prefix}.eps"] = (1,)

        specs: Dict[str, Tuple[int, ...]] = {}
        frn("layer1.0", 1, specs)
        specs["layer1.1.tau"] = (1, 1, 1, 1)
        specs["layer1.2.weight"] = (32, 1, 3, 3)
        specs["layer1.2.bias"] = (32,)
        frn("layer1.3", 32, specs)
        specs["layer1.4.tau"] = (1, 32, 1, 1)
        for name, ci, cin, cout, _s in _HYNET_LAYERS:
            specs[f"{name}.{ci}.weight"] = (cout, cin, 3, 3)
            specs[f"{name}.{ci}.bias"] = (cout,)
            frn(f"{name}.{ci + 1}", cout, specs)
            specs[f"{name}.{ci + 2}.tau"] = (1, cout, 1, 1)
        specs["layer7.1.weight"] = (128, 128, 8, 8)
        specs["layer7.2.running_mean"] = (128,)
        specs["layer7.2.running_var"] = (128,)
        return specs

    def __init__(self, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None,
                 eps_l2_norm: float = 1e-10):
        self.eps_l2_norm = eps_l2_norm
        self.params = params if params is not None else _init_from_specs(
            key if key is not None else jax.random.PRNGKey(2), self._specs())

    @classmethod
    def from_torch(cls, state_dict) -> "HyNet":
        return cls(_convert_torch(state_dict, cls._specs()))

    def __call__(self, patches: jax.Array) -> jax.Array:
        x = as_float(patches)
        if x.shape[-1] != 32:
            from ..ops.warp import resize
            x = resize(x, (32, 32))
        p = self.params
        x = _tlu(p, "layer1.1", _frn(p, "layer1.0", x))
        x = _tlu(p, "layer1.4",
                 _frn(p, "layer1.3", _tconv(p, "layer1.2", x, 1, 1)))
        for name, ci, _cin, _cout, s in _HYNET_LAYERS:
            x = _tconv(p, f"{name}.{ci}", x, s, 1)
            x = _tlu(p, f"{name}.{ci + 2}", _frn(p, f"{name}.{ci + 1}", x))
        x = _tbn(p, "layer7.2", _tconv(p, "layer7.1", x), affine=False)
        return _lrn_l2(x + self.eps_l2_norm).reshape(x.shape[0], -1)


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
    """Exact Key.Net response network (reference: feature/keynet.py:133-181):
    per pyramid level (pyrdown ×1.2, `num_levels` levels) run a handcrafted
    gradient block (10 features from iterated sobel, keynet.py:74-93) and a
    learnable block (3×(conv5 → BN → ReLU), keynet.py:96-131), upsample all
    levels to the input size, concat, and apply a final conv5 → ReLU.

    (B, 1, H, W) → (B, 1, H, W); `KeyNet.from_torch` loads the published
    checkpoint's ``state_dict``."""

    def __init__(self, params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None, num_filters: int = 8,
                 num_levels: int = 3, kernel_size: int = 5):
        self.num_filters = num_filters
        self.num_levels = num_levels
        self.kernel_size = kernel_size
        self.params = params if params is not None else _init_from_specs(
            key if key is not None else jax.random.PRNGKey(3),
            self._specs(num_filters, num_levels, kernel_size))

    @staticmethod
    def _specs(num_filters: int = 8, num_levels: int = 3,
               kernel_size: int = 5) -> Dict[str, Tuple[int, ...]]:
        specs: Dict[str, Tuple[int, ...]] = {}
        cin = 10
        for i in range(3):
            pre = f"feature_extractor.lb_block.conv{i}"
            specs[f"{pre}.0.weight"] = (num_filters, cin, kernel_size,
                                        kernel_size)
            specs[f"{pre}.0.bias"] = (num_filters,)
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                specs[f"{pre}.1.{suffix}"] = (num_filters,)
            cin = num_filters
        specs["last_conv.0.weight"] = (1, num_filters * num_levels,
                                       kernel_size, kernel_size)
        specs["last_conv.0.bias"] = (1,)
        return specs

    @classmethod
    def from_torch(cls, state_dict, num_filters: int = 8,
                   num_levels: int = 3, kernel_size: int = 5) -> "KeyNet":
        return cls(_convert_torch(
            state_dict, cls._specs(num_filters, num_levels, kernel_size)),
            num_filters=num_filters, num_levels=num_levels,
            kernel_size=kernel_size)

    def _handcrafted(self, x: jax.Array) -> jax.Array:
        g = spatial_gradient(x, "sobel", 1)
        dx, dy = g[:, :, 0], g[:, :, 1]
        gx2 = spatial_gradient(dx, "sobel", 1)
        dxx, dxy = gx2[:, :, 0], gx2[:, :, 1]
        dyy = spatial_gradient(dy, "sobel", 1)[:, :, 1]
        return jnp.concatenate(
            [dx, dy, dx * dx, dy * dy, dx * dy, dxy, dxy * dxy, dxx, dyy,
             dxx * dyy], axis=1)

    def _extract(self, x: jax.Array) -> jax.Array:
        h = self._handcrafted(x)
        pad = self.kernel_size // 2
        for i in range(3):
            pre = f"feature_extractor.lb_block.conv{i}"
            h = jax.nn.relu(_tbn(self.params, f"{pre}.1",
                                 _tconv(self.params, f"{pre}.0", h, 1, pad)))
        return h

    def __call__(self, x: jax.Array, sigmas=None) -> jax.Array:
        from ..ops.pyramid import pyrdown
        from ..ops.warp import resize
        x = as_float(x)
        H, W = x.shape[-2:]
        feats = [self._extract(x)]
        for _ in range(1, self.num_levels):
            x = pyrdown(x, factor=1.2)
            feats.append(resize(self._extract(x), (H, W), "bilinear",
                                align_corners=False))
        h = jnp.concatenate(feats, axis=1)
        out = jax.nn.relu(_tconv(self.params, "last_conv.0", h, 1,
                                 self.kernel_size // 2))
        if sigmas is not None:
            # scale normalization for use inside ScaleSpaceDetector (our
            # responses.py convention); the reference uses KeyNet through
            # MultiResolutionDetector which skips this
            s = jnp.reshape(sigmas, (-1, 1, 1, 1))
            out = out * (s * s)
        return out


def load_tfeat_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """torch TFeat checkpoint -> TFeat param dict (layout-checked)."""
    return _convert_torch(state_dict, TFeat._SPECS)


def load_sosnet_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """torch SOSNet checkpoint -> SOSNet param dict (layout-checked)."""
    return _convert_torch(state_dict, SOSNet._specs())


def load_hynet_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """torch HyNet checkpoint -> HyNet param dict (layout-checked)."""
    return _convert_torch(state_dict, HyNet._specs())


def load_keynet_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """torch Key.Net checkpoint -> KeyNet param dict (layout-checked)."""
    return _convert_torch(state_dict, KeyNet._specs())


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
