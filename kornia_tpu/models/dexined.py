"""DexiNed edge-detection network — exact reference architecture
(reference: kornia/models/dexined.py:186-329) so the published
`DexiNed_BIPED_10.pth` checkpoint drops in via `load_torch_weights`.

TPU-native design notes:
  * NHWC compute internally (public API stays (B, C, H, W));
  * parameters are a flat dict keyed by the torch state-dict names, with
    conv weights stored HWIO and transposed convs pre-converted to their
    equivalent lhs-dilated gather convolutions (spatial flip + in/out swap)
    so the hot path is a single `lax.conv_general_dilated` per layer;
  * all shapes static — the six side outputs are bilinearly resized to the
    input size inside the traced graph.

Blocks (reference line refs):
  DoubleConvBlock  dexined.py:165   conv3x3(s)->BN->ReLU->conv3x3->BN[->ReLU]
  SingleConvBlock  dexined.py:151   conv1x1(s)[->BN]
  _DenseLayer      dexined.py:81    ReLU->conv3x3(p=2)->BN->ReLU->conv3x3(p=0)->BN,
                                    [x1,x2] -> [0.5*(f(x1)+x2), x2]
  UpConvBlock      dexined.py:119   (conv1x1->ReLU->convT(k=2^s, s=2))*s + resize
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["DexiNed", "dexined_init_params", "load_torch_weights"]

_BN_EPS = 1e-5

# name -> (in, mid, out, stride, use_act)
_DOUBLE = {
    "block_1": (3, 32, 64, 2, True),
    "block_2": (64, 128, 128, 1, False),
}
# name -> (num_layers, in, out)
_DENSE = {
    "dblock_3": (2, 128, 256),
    "dblock_4": (3, 256, 512),
    "dblock_5": (3, 512, 512),
    "dblock_6": (3, 512, 256),
}
# name -> (in, out, stride, use_bn)
_SINGLE = {
    "side_1": (64, 128, 2, True),
    "side_2": (128, 256, 2, True),
    "side_3": (256, 512, 2, True),
    "side_4": (512, 512, 1, True),
    "side_5": (512, 256, 1, True),  # defined by the reference, unused in forward
    "pre_dense_2": (128, 256, 2, True),
    "pre_dense_3": (128, 256, 1, True),
    "pre_dense_4": (256, 512, 1, True),
    "pre_dense_5": (512, 512, 1, True),
    "pre_dense_6": (512, 256, 1, True),
    "block_cat": (6, 1, 1, False),
}
# name -> (in, up_scale); per stage i: out = 1 if last else 16,
# kernel = 2**up_scale, pad = all_pads[up_scale] (reference dexined.py:131)
_UP = {
    "up_block_1": (64, 1),
    "up_block_2": (128, 1),
    "up_block_3": (256, 2),
    "up_block_4": (512, 3),
    "up_block_5": (512, 4),
    "up_block_6": (256, 4),
}
_ALL_PADS = [0, 0, 1, 3, 7]
_UP_CONST_FEATURES = 16


def _up_stages(in_ch: int, up_scale: int) -> List[Tuple[int, int, int, int]]:
    """(seq_idx_conv, in, out, seq_idx_convT) channel plan of an UpConvBlock."""
    stages = []
    cur = in_ch
    for i in range(up_scale):
        out = 1 if i == up_scale - 1 else _UP_CONST_FEATURES
        stages.append((3 * i, cur, out, 3 * i + 2))
        cur = out
    return stages


# -----------------------------------------------------------------------------
# Parameter table (shared by init and the torch converter)
# -----------------------------------------------------------------------------

def _param_specs() -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    """torch-key -> (kind, torch_shape); kind in conv_w/convT_w/vec."""
    specs: Dict[str, Tuple[str, Tuple[int, ...]]] = {}

    def bn(prefix: str, ch: int) -> None:
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            specs[f"{prefix}.{suffix}"] = ("vec", (ch,))

    for name, (cin, mid, cout, _s, _a) in _DOUBLE.items():
        specs[f"{name}.conv1.weight"] = ("conv_w", (mid, cin, 3, 3))
        specs[f"{name}.conv1.bias"] = ("vec", (mid,))
        bn(f"{name}.bn1", mid)
        specs[f"{name}.conv2.weight"] = ("conv_w", (cout, mid, 3, 3))
        specs[f"{name}.conv2.bias"] = ("vec", (cout,))
        bn(f"{name}.bn2", cout)
    for name, (nl, cin, cout) in _DENSE.items():
        cur = cin
        for i in range(1, nl + 1):
            p = f"{name}.denselayer{i}"
            specs[f"{p}.conv1.weight"] = ("conv_w", (cout, cur, 3, 3))
            specs[f"{p}.conv1.bias"] = ("vec", (cout,))
            bn(f"{p}.norm1", cout)
            specs[f"{p}.conv2.weight"] = ("conv_w", (cout, cout, 3, 3))
            specs[f"{p}.conv2.bias"] = ("vec", (cout,))
            bn(f"{p}.norm2", cout)
            cur = cout
    for name, (cin, cout, _s, use_bn) in _SINGLE.items():
        specs[f"{name}.conv.weight"] = ("conv_w", (cout, cin, 1, 1))
        specs[f"{name}.conv.bias"] = ("vec", (cout,))
        # the reference's SingleConvBlock always *creates* a BN module, so the
        # checkpoint carries stats even when use_bn=False (dexined.py:151-162)
        bn(f"{name}.bn", cout)
    for name, (cin, up_scale) in _UP.items():
        k = 2 ** up_scale
        for idx_c, ci, co, idx_t in _up_stages(cin, up_scale):
            specs[f"{name}.features.{idx_c}.weight"] = ("conv_w", (co, ci, 1, 1))
            specs[f"{name}.features.{idx_c}.bias"] = ("vec", (co,))
            specs[f"{name}.features.{idx_t}.weight"] = ("convT_w", (co, co, k, k))
            specs[f"{name}.features.{idx_t}.bias"] = ("vec", (co,))
    return specs


def dexined_init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Xavier-normal conv init (reference weight_init, dexined.py:37-58),
    identity BN; weights already in TPU layout (HWIO)."""
    params: Dict[str, jax.Array] = {}
    for name, (kind, shape) in _param_specs().items():
        key, sub = jax.random.split(key)
        if kind in ("conv_w", "convT_w"):
            o, i, kh, kw = shape
            std = (2.0 / ((i + o) * kh * kw)) ** 0.5
            w = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
            params[name] = w
        elif name.endswith("running_var") or name.endswith(".weight"):
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """Convert the reference DexiNed torch state_dict into TPU-layout params.

    conv (O,I,kH,kW) -> HWIO; ConvTranspose2d (I,O,kH,kW) -> the equivalent
    gather-conv kernel: spatial flip, then HWIO with the transpose's input
    channels as the conv input.
    """
    import numpy as np

    specs = _param_specs()
    params: Dict[str, jax.Array] = {}
    for k, (kind, shape) in specs.items():
        v = np.asarray(state_dict[k].detach().cpu().numpy()
                       if hasattr(state_dict[k], "detach") else state_dict[k])
        if kind == "conv_w":
            assert v.shape == shape, (k, v.shape, shape)
            params[k] = jnp.asarray(v.transpose(2, 3, 1, 0))
        elif kind == "convT_w":
            # torch shape (in, out, kH, kW)
            assert v.shape == shape, (k, v.shape, shape)
            params[k] = jnp.asarray(v[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        else:
            params[k] = jnp.asarray(v)
    return params


# -----------------------------------------------------------------------------
# Layer primitives (NHWC)
# -----------------------------------------------------------------------------

def _conv(p, name, x, stride=1, pad=0):
    w = p[f"{name}.weight"]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b.astype(x.dtype)


def _conv_transpose(p, name, x, kernel, pad):
    """torch ConvTranspose2d(k, stride=2, padding=pad) as an lhs-dilated conv."""
    w = p[f"{name}.weight"]
    e = kernel - 1 - pad
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(e, e), (e, e)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p[f"{name}.bias"].astype(x.dtype)


def _bn(p, name, x):
    mean = p[f"{name}.running_mean"].astype(x.dtype)
    var = p[f"{name}.running_var"].astype(x.dtype)
    g = p[f"{name}.weight"].astype(x.dtype)
    b = p[f"{name}.bias"].astype(x.dtype)
    scale = g * lax.rsqrt(var + _BN_EPS)
    return x * scale + (b - mean * scale)


def _double_conv(p, name, x):
    _cin, _mid, _cout, stride, use_act = _DOUBLE[name]
    x = jax.nn.relu(_bn(p, f"{name}.bn1", _conv(p, f"{name}.conv1", x, stride, 1)))
    x = _bn(p, f"{name}.bn2", _conv(p, f"{name}.conv2", x, 1, 1))
    return jax.nn.relu(x) if use_act else x


def _single_conv(p, name, x):
    _cin, _cout, stride, use_bn = _SINGLE[name]
    x = _conv(p, f"{name}.conv", x, stride, 0)
    return _bn(p, f"{name}.bn", x) if use_bn else x


def _dense_block(p, name, x1, x2):
    nl = _DENSE[name][0]
    for i in range(1, nl + 1):
        pre = f"{name}.denselayer{i}"
        x3 = jax.nn.relu(x1)
        x3 = jax.nn.relu(_bn(p, f"{pre}.norm1", _conv(p, f"{pre}.conv1", x3, 1, 2)))
        x3 = _bn(p, f"{pre}.norm2", _conv(p, f"{pre}.conv2", x3, 1, 0))
        x1 = 0.5 * (x3 + x2)
    return x1


def _up_block(p, name, x, out_hw):
    cin, up_scale = _UP[name]
    k, pad = 2 ** up_scale, _ALL_PADS[up_scale]
    for idx_c, _ci, _co, idx_t in _up_stages(cin, up_scale):
        x = jax.nn.relu(_conv(p, f"{name}.features.{idx_c}", x))
        x = _conv_transpose(p, f"{name}.features.{idx_t}", x, k, pad)
    from ..ops.warp import resize
    x = jnp.transpose(x, (0, 3, 1, 2))
    x = resize(x, out_hw, "bilinear", align_corners=False)
    return jnp.transpose(x, (0, 2, 3, 1))


def _maxpool3x3s2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


# -----------------------------------------------------------------------------
# Network
# -----------------------------------------------------------------------------

def dexined_features(params: Dict[str, jax.Array], images: jax.Array) -> List[jax.Array]:
    """The six multi-scale side outputs (reference get_features,
    dexined.py:256-311). images: (B, 3, H, W) -> six (B, 1, H, W)."""
    x = jnp.transpose(as_float(images), (0, 2, 3, 1))
    out_hw = images.shape[-2:]
    p = params

    block_1 = _double_conv(p, "block_1", x)
    block_1_side = _single_conv(p, "side_1", block_1)

    block_2 = _double_conv(p, "block_2", block_1)
    block_2_down = _maxpool3x3s2(block_2)
    block_2_add = block_2_down + block_1_side
    block_2_side = _single_conv(p, "side_2", block_2_add)

    block_3_pre_dense = _single_conv(p, "pre_dense_3", block_2_down)
    block_3 = _dense_block(p, "dblock_3", block_2_add, block_3_pre_dense)
    block_3_down = _maxpool3x3s2(block_3)
    block_3_add = block_3_down + block_2_side
    block_3_side = _single_conv(p, "side_3", block_3_add)

    block_2_resize_half = _single_conv(p, "pre_dense_2", block_2_down)
    block_4_pre_dense = _single_conv(p, "pre_dense_4",
                                     block_3_down + block_2_resize_half)
    block_4 = _dense_block(p, "dblock_4", block_3_add, block_4_pre_dense)
    block_4_down = _maxpool3x3s2(block_4)
    block_4_add = block_4_down + block_3_side
    block_4_side = _single_conv(p, "side_4", block_4_add)

    block_5_pre_dense = _single_conv(p, "pre_dense_5", block_4_down)
    block_5 = _dense_block(p, "dblock_5", block_4_add, block_5_pre_dense)
    block_5_add = block_5 + block_4_side

    block_6_pre_dense = _single_conv(p, "pre_dense_6", block_5)
    block_6 = _dense_block(p, "dblock_6", block_5_add, block_6_pre_dense)

    outs = []
    for name, feat in zip(_UP, (block_1, block_2, block_3, block_4, block_5,
                                block_6)):
        o = _up_block(p, name, feat, out_hw)
        outs.append(jnp.transpose(o, (0, 3, 1, 2)))
    return outs


def dexined_forward(params: Dict[str, jax.Array], images: jax.Array) -> jax.Array:
    """Fused edge map (B, 1, H, W), pre-sigmoid (reference forward,
    dexined.py:313-329)."""
    feats = dexined_features(params, images)
    cat = jnp.concatenate([jnp.transpose(f, (0, 2, 3, 1)) for f in feats], -1)
    fused = _single_conv(params, "block_cat", cat)
    return jnp.transpose(fused, (0, 3, 1, 2))


class DexiNed:
    """Callable DexiNed; (B, 3, H, W) -> (B, 1, H, W) pre-sigmoid edges."""

    def __init__(self, params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None):
        self.params = params if params is not None else dexined_init_params(
            key if key is not None else jax.random.PRNGKey(0))

    def get_features(self, images: jax.Array) -> List[jax.Array]:
        return dexined_features(self.params, images)

    def __call__(self, images: jax.Array) -> jax.Array:
        return dexined_forward(self.params, images)
