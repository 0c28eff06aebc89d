"""YuNet face-detection network — exact reference architecture
(reference: kornia/models/yunet/model.py:56-161, processors.py:27-119) so
the published `yunet_final.pth` checkpoint drops in via
`load_torch_weights`.

TPU-native design: NHWC compute, depthwise convs as grouped
`lax.conv_general_dilated` (feature_group_count=C), static prior boxes
precomputed at trace time from the (static) image size, and a fully
padded/masked decode so the whole detector jits as one executable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["YuNet", "yunet_init_params", "load_torch_weights",
           "prior_boxes", "decode", "MIN_SIZES", "STEPS", "VARIANCE"]

_BN_EPS = 1e-5

MIN_SIZES: Tuple[Tuple[int, ...], ...] = ((10, 16, 24), (32, 48), (64, 96),
                                          (128, 192, 256))
STEPS: Tuple[int, ...] = (8, 16, 32, 64)
VARIANCE: Tuple[float, float] = (0.1, 0.2)

# backbone blocks: name -> (in, out); head blocks: per-level anchor counts
_BLOCKS = (("model1", 16, 64), ("model2", 64, 64), ("model3", 64, 64),
           ("model4", 64, 64), ("model5", 64, 64), ("model6", 64, 64))
_HEAD_ANCHORS = (3, 2, 2, 3)  # x (14 loc + 2 conf + 1 iou) channels


# -----------------------------------------------------------------------------
# Parameter table
# -----------------------------------------------------------------------------

def _param_specs() -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    specs: Dict[str, Tuple[str, Tuple[int, ...]]] = {}

    def bn(prefix: str, ch: int) -> None:
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            specs[f"{prefix}.{suffix}"] = ("vec", (ch,))

    def dp_unit(prefix: str, cin: int, cout: int, with_bn: bool) -> None:
        specs[f"{prefix}.conv1.weight"] = ("conv_w", (cout, cin, 1, 1))
        specs[f"{prefix}.conv1.bias"] = ("vec", (cout,))
        specs[f"{prefix}.conv2.weight"] = ("dw_w", (cout, 1, 3, 3))
        specs[f"{prefix}.conv2.bias"] = ("vec", (cout,))
        if with_bn:
            bn(f"{prefix}.bn", cout)

    def block4(prefix: str, cin: int, cout: int, with_bn: bool) -> None:
        dp_unit(f"{prefix}.conv1", cin, cin, True)
        dp_unit(f"{prefix}.conv2", cin, cout, with_bn)

    # Conv_head(3, 16, 16)
    specs["model0.conv1.weight"] = ("conv_w", (16, 3, 3, 3))
    specs["model0.conv1.bias"] = ("vec", (16,))
    bn("model0.bn1", 16)
    dp_unit("model0.conv2", 16, 16, True)
    for name, cin, cout in _BLOCKS:
        block4(name, cin, cout, True)
    for i, a in enumerate(_HEAD_ANCHORS):
        block4(f"head.{i}", 64, a * 17, False)
    return specs


def yunet_init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs().items():
        key, sub = jax.random.split(key)
        if kind in ("conv_w", "dw_w"):
            o, i, kh, kw = shape
            std = (2.0 / ((i + o) * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif name.endswith("running_var") or name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """torch conv (O,I,kH,kW) -> HWIO; depthwise (C,1,3,3) -> (3,3,1,C)."""
    import numpy as np

    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in _param_specs().items():
        v = np.asarray(state_dict[k].detach().cpu().numpy()
                       if hasattr(state_dict[k], "detach") else state_dict[k])
        assert v.shape == shape, (k, v.shape, shape)
        if kind in ("conv_w", "dw_w"):
            params[k] = jnp.asarray(v.transpose(2, 3, 1, 0))
        else:
            params[k] = jnp.asarray(v)
    return params


# -----------------------------------------------------------------------------
# Layers (NHWC)
# -----------------------------------------------------------------------------

def _conv(p, name, x, stride=1, pad=0, groups=1):
    w = p[f"{name}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y + p[f"{name}.bias"].astype(x.dtype)


def _bn(p, name, x):
    mean = p[f"{name}.running_mean"].astype(x.dtype)
    var = p[f"{name}.running_var"].astype(x.dtype)
    g = p[f"{name}.weight"].astype(x.dtype)
    b = p[f"{name}.bias"].astype(x.dtype)
    scale = g * lax.rsqrt(var + _BN_EPS)
    return x * scale + (b - mean * scale)


def _dp_unit(p, prefix, x, with_bn):
    x = _conv(p, f"{prefix}.conv1", x)
    c = x.shape[-1]
    x = _conv(p, f"{prefix}.conv2", x, 1, 1, groups=c)
    if with_bn:
        x = jax.nn.relu(_bn(p, f"{prefix}.bn", x))
    return x


def _block4(p, prefix, x, with_bn):
    x = _dp_unit(p, f"{prefix}.conv1", x, True)
    return _dp_unit(p, f"{prefix}.conv2", x, with_bn)


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


# -----------------------------------------------------------------------------
# Network
# -----------------------------------------------------------------------------

def yunet_forward(params: Dict[str, jax.Array], images: jax.Array,
                  phase: str = "test") -> Dict[str, jax.Array]:
    """(B, 3, H, W) -> {'loc': (B,N,14), 'conf': (B,N,2), 'iou': (B,N,1)}
    (reference model.py:111-161; conf is softmaxed in 'test' phase)."""
    p = params
    x = jnp.transpose(as_float(images), (0, 2, 3, 1))
    x = jax.nn.relu(_bn(p, "model0.bn1", _conv(p, "model0.conv1", x, 2, 1)))
    x = _dp_unit(p, "model0.conv2", x, True)
    x = _maxpool2(x)
    x = _block4(p, "model1", x, True)
    x = _block4(p, "model2", x, True)
    x = _maxpool2(x)
    sources = []
    x = _block4(p, "model3", x, True)
    sources.append(x)
    for name in ("model4", "model5", "model6"):
        x = _maxpool2(x)
        x = _block4(p, name, x, True)
        sources.append(x)

    heads = []
    for i, src in enumerate(sources):
        h = _block4(p, f"head.{i}", src, False)  # NHWC already
        heads.append(h.reshape(h.shape[0], -1))
    data = jnp.concatenate(heads, 1).reshape(images.shape[0], -1, 17)
    loc, conf, iou = data[..., :14], data[..., 14:16], data[..., 16:17]
    if phase == "test":
        conf = jax.nn.softmax(conf, axis=-1)
    return {"loc": loc, "conf": conf, "iou": iou}


class YuNet:
    """Callable YuNet; (B, 3, H, W) -> dict of loc/conf/iou."""

    def __init__(self, params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None, phase: str = "test"):
        self.params = params if params is not None else yunet_init_params(
            key if key is not None else jax.random.PRNGKey(0))
        self.phase = phase

    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        return yunet_forward(self.params, images, self.phase)


# -----------------------------------------------------------------------------
# Priors + decode (reference processors.py)
# -----------------------------------------------------------------------------

def prior_boxes(image_size: Tuple[int, int],
                min_sizes: Sequence[Sequence[int]] = MIN_SIZES,
                steps: Sequence[int] = STEPS, clip: bool = False,
                dtype=jnp.float32) -> jax.Array:
    """(N, 4) normalized (cx, cy, w, h) anchors (reference
    processors.py:56-119). Static given the image size — computed with
    numpy at trace time, constant-folded by XLA."""
    import numpy as np

    h, w = image_size
    fm2 = [int(int((h + 1) / 2) / 2), int(int((w + 1) / 2) / 2)]
    fmaps = []
    f = fm2
    for _ in range(4):
        f = [int(f[0] / 2), int(f[1] / 2)]
        fmaps.append(f)
    anchors = []
    for k, fmap in enumerate(fmaps):
        ii, jj = np.meshgrid(np.arange(fmap[0]), np.arange(fmap[1]),
                             indexing="ij")
        for m in min_sizes[k]:
            cx = (jj + 0.5) * steps[k] / w
            cy = (ii + 0.5) * steps[k] / h
            a = np.stack([cx, cy, np.full_like(cx, m / w),
                          np.full_like(cy, m / h)], -1)
            anchors.append(a.reshape(fmap[0], fmap[1], 1, 4))
        # interleave per-cell over min_sizes like the reference's nested loop
    out = []
    idx = 0
    for k, fmap in enumerate(fmaps):
        group = np.concatenate(anchors[idx:idx + len(min_sizes[k])], 2)
        out.append(group.reshape(-1, 4))
        idx += len(min_sizes[k])
    res = np.concatenate(out, 0).astype(np.float32)
    if clip:
        res = np.clip(res, 0.0, 1.0)
    return jnp.asarray(res, dtype)


def decode(loc: jax.Array, priors: jax.Array,
           variances: Tuple[float, float] = VARIANCE) -> jax.Array:
    """(…, N, 14) offsets + (N, 4) priors -> (…, N, 14) boxes:
    xyxy + five landmark xy pairs (reference processors.py:27-53)."""
    c, s = priors[..., 0:2], priors[..., 2:4]
    v0, v1 = variances
    center = c + loc[..., 0:2] * v0 * s
    size = s * jnp.exp(loc[..., 2:4] * v1)
    lmk = [c + loc[..., 4 + 2 * i: 6 + 2 * i] * v0 * s for i in range(5)]
    tl = center - size / 2
    return jnp.concatenate([tl, size + tl] + lmk, -1)
