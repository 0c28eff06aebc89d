"""LoFTR detector-free matcher — exact reference architecture
(reference: kornia/feature/loftr/ — loftr.py:69-222, backbone/
resnet_fpn.py:33-170, loftr_module/transformer.py:28-143,
loftr_module/linear_attention.py:37-90, loftr_module/fine_preprocess.py:
25-120, utils/position_encoding.py:24-92, utils/coarse_matching.py:78-303,
utils/fine_matching.py:30-109) so the published outdoor/indoor ckpts drop
in via `LoFTR.from_torch`.

TPU-native design: NHWC/HWIO convs keyed by the torch state-dict names;
the coarse linear attention is two matmul chains (MXU-perfect); coarse
matching returns FIXED-K matches with confidence + validity masks instead
of the reference's thresholded variable-length lists, so the whole
backbone → transformer → dual-softmax → fine-refinement path jits as one
executable. The (H·W/64)² coarse stage is context-parallelizable over a
mesh (SURVEY.md §5).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["LoFTR", "LoFTRConfig"]

_INF = 1e9


class LoFTRConfig:
    """Mirror of the reference `default_cfg` (loftr.py:40-67), with the
    variable-length outputs replaced by a fixed `top_k`."""

    def __init__(self, initial_dim: int = 128,
                 block_dims: Optional[Tuple[int, int, int]] = None,
                 coarse_dim: int = 256, fine_dim: int = 128,
                 num_coarse_layers: int = 4, num_fine_layers: int = 1,
                 num_heads: int = 8, fine_window: int = 5, top_k: int = 512,
                 temp_bug_fix: bool = False, thr: float = 0.2,
                 border_rm: int = 2, dsmax_temperature: float = 0.1,
                 cat_c_feat: bool = True):
        self.coarse_dim = coarse_dim
        self.fine_dim = fine_dim
        if block_dims is None:
            block_dims = (128, 196, 256) if coarse_dim == 256 else (
                fine_dim, (fine_dim + coarse_dim) // 2, coarse_dim)
        self.block_dims = block_dims
        self.initial_dim = initial_dim if coarse_dim == 256 else fine_dim
        self.num_coarse_layers = num_coarse_layers
        self.num_fine_layers = num_fine_layers
        self.num_heads = num_heads
        self.fine_window = fine_window
        self.top_k = top_k
        self.temp_bug_fix = temp_bug_fix
        self.thr = thr
        self.border_rm = border_rm
        self.dsmax_temperature = dsmax_temperature
        self.cat_c_feat = cat_c_feat


# -----------------------------------------------------------------------------
# Parameter table
# -----------------------------------------------------------------------------

def _param_specs(cfg: LoFTRConfig) -> Dict[str, Tuple[int, ...]]:
    specs: Dict[str, Tuple[int, ...]] = {}

    def bn(prefix: str, ch: int) -> None:
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            specs[f"{prefix}.{suffix}"] = (ch,)

    bd = cfg.block_dims
    specs["backbone.conv1.weight"] = (cfg.initial_dim, 1, 7, 7)
    bn("backbone.bn1", cfg.initial_dim)
    in_planes = cfg.initial_dim
    for li, (dim, stride) in enumerate(zip(bd, (1, 2, 2)), start=1):
        for bi in range(2):
            pre = f"backbone.layer{li}.{bi}"
            cin = in_planes if bi == 0 else dim
            s = stride if bi == 0 else 1
            specs[f"{pre}.conv1.weight"] = (dim, cin, 3, 3)
            specs[f"{pre}.conv2.weight"] = (dim, dim, 3, 3)
            bn(f"{pre}.bn1", dim)
            bn(f"{pre}.bn2", dim)
            if s != 1:
                specs[f"{pre}.downsample.0.weight"] = (dim, cin, 1, 1)
                bn(f"{pre}.downsample.1", dim)
        in_planes = dim
    specs["backbone.layer3_outconv.weight"] = (bd[2], bd[2], 1, 1)
    specs["backbone.layer2_outconv.weight"] = (bd[2], bd[1], 1, 1)
    specs["backbone.layer2_outconv2.0.weight"] = (bd[2], bd[2], 3, 3)
    bn("backbone.layer2_outconv2.1", bd[2])
    specs["backbone.layer2_outconv2.3.weight"] = (bd[1], bd[2], 3, 3)
    specs["backbone.layer1_outconv.weight"] = (bd[1], bd[0], 1, 1)
    specs["backbone.layer1_outconv2.0.weight"] = (bd[1], bd[1], 3, 3)
    bn("backbone.layer1_outconv2.1", bd[1])
    specs["backbone.layer1_outconv2.3.weight"] = (bd[0], bd[1], 3, 3)

    def encoder(prefix: str, n_layers: int, d: int) -> None:
        for i in range(n_layers):
            pre = f"{prefix}.layers.{i}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                specs[f"{pre}.{proj}.weight"] = (d, d)
            specs[f"{pre}.mlp.0.weight"] = (2 * d, 2 * d)
            specs[f"{pre}.mlp.2.weight"] = (d, 2 * d)
            for norm in ("norm1", "norm2"):
                specs[f"{pre}.{norm}.weight"] = (d,)
                specs[f"{pre}.{norm}.bias"] = (d,)

    encoder("loftr_coarse", 2 * cfg.num_coarse_layers, cfg.coarse_dim)
    encoder("loftr_fine", 2 * cfg.num_fine_layers, cfg.fine_dim)
    if cfg.cat_c_feat:
        specs["fine_preprocess.down_proj.weight"] = (cfg.fine_dim,
                                                     cfg.coarse_dim)
        specs["fine_preprocess.down_proj.bias"] = (cfg.fine_dim,)
        specs["fine_preprocess.merge_feat.weight"] = (cfg.fine_dim,
                                                      2 * cfg.fine_dim)
        specs["fine_preprocess.merge_feat.bias"] = (cfg.fine_dim,)
    return specs


def loftr_init_params(key: jax.Array, cfg: Optional[LoFTRConfig] = None,
                      dtype=jnp.float32) -> Dict[str, jax.Array]:
    cfg = cfg or LoFTRConfig()
    params: Dict[str, jax.Array] = {}
    for name, shape in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if name.endswith("running_var"):
            params[name] = jnp.ones(shape, dtype)
        elif len(shape) == 4:
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif len(shape) == 2:
            params[name] = jax.random.normal(sub, shape, dtype) * (
                1.0 / shape[1]) ** 0.5
        elif name.endswith(".weight"):  # BN / LN scales
            params[name] = jnp.ones(shape, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict, cfg: Optional[LoFTRConfig] = None
                       ) -> Dict[str, jax.Array]:
    """Convert a torch LoFTR ``state_dict`` (the published ckpts'
    ['state_dict'], 'matcher.' prefix tolerated) into TPU-layout params."""
    import numpy as np

    cfg = cfg or LoFTRConfig()
    sd = {(k[8:] if k.startswith("matcher.") else k): v
          for k, v in state_dict.items()}
    params: Dict[str, jax.Array] = {}
    for k, shape in _param_specs(cfg).items():
        v = sd[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
    return params


# -----------------------------------------------------------------------------
# Backbone (NHWC)
# -----------------------------------------------------------------------------

def _conv(p, name, x, stride=1, pad=0):
    w = p[f"{name}.weight"].astype(x.dtype)
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p, name, x):
    mean = p[f"{name}.running_mean"].astype(x.dtype)
    var = p[f"{name}.running_var"].astype(x.dtype)
    scale = p[f"{name}.weight"].astype(x.dtype) * lax.rsqrt(var + 1e-5)
    return x * scale + (p[f"{name}.bias"].astype(x.dtype) - mean * scale)


def _basic_block(p, pre, x, stride):
    y = jax.nn.relu(_bn(p, f"{pre}.bn1", _conv(p, f"{pre}.conv1", x, stride,
                                               1)))
    y = _bn(p, f"{pre}.bn2", _conv(p, f"{pre}.conv2", y, 1, 1))
    if stride != 1:
        x = _bn(p, f"{pre}.downsample.1",
                _conv(p, f"{pre}.downsample.0", x, stride, 0))
    return jax.nn.relu(x + y)


def _up2(x, hw):
    """torch F.interpolate(..., align_corners=True) to target hw."""
    from ..ops.warp import resize
    return jnp.transpose(
        resize(jnp.transpose(x, (0, 3, 1, 2)), hw, "bilinear",
               align_corners=True), (0, 2, 3, 1))


def loftr_backbone(p, cfg: LoFTRConfig, images: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """ResNetFPN_8_2 (reference resnet_fpn.py:80-170):
    (B, 1, H, W) → (coarse NHWC 1/8 @ block_dims[2], fine NHWC 1/2 @
    block_dims[0])."""
    x = jnp.transpose(as_float(images), (0, 2, 3, 1))
    x0 = jax.nn.relu(_bn(p, "backbone.bn1",
                         _conv(p, "backbone.conv1", x, 2, 3)))
    feats = []
    h = x0
    for li, stride in zip((1, 2, 3), (1, 2, 2)):
        h = _basic_block(p, f"backbone.layer{li}.0", h, stride)
        h = _basic_block(p, f"backbone.layer{li}.1", h, 1)
        feats.append(h)
    x1, x2, x3 = feats
    x3_out = _conv(p, "backbone.layer3_outconv", x3)
    x2_out = _conv(p, "backbone.layer2_outconv", x2)
    t = x2_out + _up2(x3_out, x2.shape[1:3])
    t = jax.nn.leaky_relu(_bn(p, "backbone.layer2_outconv2.1",
                              _conv(p, "backbone.layer2_outconv2.0", t, 1,
                                    1)), 0.01)
    x2_out = _conv(p, "backbone.layer2_outconv2.3", t, 1, 1)
    x1_out = _conv(p, "backbone.layer1_outconv", x1)
    t = x1_out + _up2(x2_out, x1.shape[1:3])
    t = jax.nn.leaky_relu(_bn(p, "backbone.layer1_outconv2.1",
                              _conv(p, "backbone.layer1_outconv2.0", t, 1,
                                    1)), 0.01)
    x1_out = _conv(p, "backbone.layer1_outconv2.3", t, 1, 1)
    return x3_out, x1_out


# -----------------------------------------------------------------------------
# Position encoding + transformer
# -----------------------------------------------------------------------------

def position_encoding(d_model: int, hw: Tuple[int, int],
                      temp_bug_fix: bool, dtype=jnp.float32) -> jax.Array:
    """PositionEncodingSine (reference position_encoding.py:48-70) for
    exactly (H, W); positions are 1-indexed (cumsum of ones)."""
    H, W = hw
    ar = jnp.arange(0, d_model // 2, 2, dtype=dtype)
    if temp_bug_fix:
        div = jnp.exp(ar * (-math.log(10000.0) / (d_model // 2)))
    else:  # the reference's buggy (floor-division) variant the published
        # outdoor/indoor checkpoints were trained with
        div = jnp.exp(ar * (-math.log(10000.0) / d_model // 2))
    y = jnp.arange(1, H + 1, dtype=dtype)[None, :, None]   # (1, H, 1)
    x = jnp.arange(1, W + 1, dtype=dtype)[None, None, :]   # (1, 1, W)
    div = div[:, None, None]
    pe = jnp.zeros((d_model, H, W), dtype)
    pe = pe.at[0::4].set(jnp.sin(x * div))
    pe = pe.at[1::4].set(jnp.cos(x * div))
    pe = pe.at[2::4].set(jnp.sin(y * div))
    pe = pe.at[3::4].set(jnp.cos(y * div))
    return jnp.transpose(pe, (1, 2, 0))[None]  # (1, H, W, C)


def _linear_attention(q, k, v, eps=1e-6):
    """elu(·)+1 linear attention (reference linear_attention.py:37-90);
    (B, L, H, D) layout, including the v/v_length rescale."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    v_length = v.shape[1]
    v = v / v_length
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length


def _layer_norm(p, name, x):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    xn = (x - mu) * lax.rsqrt(var + 1e-5)
    return xn * p[f"{name}.weight"].astype(x.dtype) \
        + p[f"{name}.bias"].astype(x.dtype)


def _encoder_layer(p, pre, x, source, nhead):
    """LoFTREncoderLayer (reference transformer.py:28-90)."""
    B, L, C = x.shape
    d = C // nhead
    lin = lambda n, t: t @ p[f"{pre}.{n}.weight"].T.astype(t.dtype)
    q = lin("q_proj", x).reshape(B, L, nhead, d)
    k = lin("k_proj", source).reshape(B, -1, nhead, d)
    v = lin("v_proj", source).reshape(B, -1, nhead, d)
    msg = _linear_attention(q, k, v).reshape(B, L, C)
    msg = _layer_norm(p, f"{pre}.norm1", lin("merge", msg))
    msg = jnp.concatenate([x, msg], -1)
    msg = jax.nn.relu(msg @ p[f"{pre}.mlp.0.weight"].T.astype(msg.dtype))
    msg = msg @ p[f"{pre}.mlp.2.weight"].T.astype(msg.dtype)
    return x + _layer_norm(p, f"{pre}.norm2", msg)


def _transformer(p, prefix, n_layers, nhead, f0, f1):
    """LocalFeatureTransformer with alternating self/cross layers
    (reference transformer.py:93-143)."""
    for i in range(n_layers):
        pre = f"{prefix}.layers.{2 * i}"
        f0 = _encoder_layer(p, pre, f0, f0, nhead)
        f1 = _encoder_layer(p, pre, f1, f1, nhead)
        pre = f"{prefix}.layers.{2 * i + 1}"
        # the reference updates feat0 first and feeds the UPDATED feat0
        # into feat1's cross attention (transformer.py:131-133)
        f0 = _encoder_layer(p, pre, f0, f1, nhead)
        f1 = _encoder_layer(p, pre, f1, f0, nhead)
    return f0, f1


# -----------------------------------------------------------------------------
# Coarse-attention context parallelism (SURVEY §5's named TPU item; the
# reference has NO parallel path — this is a beat-the-reference feature)
# -----------------------------------------------------------------------------

def _linear_attention_dist(q, k, v, axis_name, eps=1e-6):
    """Sequence-sharded elu+1 linear attention: K/V live sharded on the
    token axis; the ONLY cross-device traffic is one psum of the (H, D, D)
    KV moment and the (H, D) K-sum — O(D^2) bytes per layer instead of
    the O(L^2) that softmax ring-attention would move. Queries stay
    sharded; the output needs no further collective."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    n_dev = jax.lax.psum(1, axis_name)
    v_length = v.shape[1] * n_dev  # GLOBAL source length
    v = v / v_length
    KV = jax.lax.psum(jnp.einsum("nshd,nshv->nhdv", K, v), axis_name)
    Ksum = jax.lax.psum(K.sum(axis=1), axis_name)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, Ksum) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length


def _encoder_layer_dist(p, pre, x, source, nhead, axis_name):
    B, L, C = x.shape
    d = C // nhead
    lin = lambda n, t: t @ p[f"{pre}.{n}.weight"].T.astype(t.dtype)
    q = lin("q_proj", x).reshape(B, L, nhead, d)
    k = lin("k_proj", source).reshape(B, -1, nhead, d)
    v = lin("v_proj", source).reshape(B, -1, nhead, d)
    msg = _linear_attention_dist(q, k, v, axis_name).reshape(B, L, C)
    msg = _layer_norm(p, f"{pre}.norm1", lin("merge", msg))
    msg = jnp.concatenate([x, msg], -1)
    msg = jax.nn.relu(msg @ p[f"{pre}.mlp.0.weight"].T.astype(msg.dtype))
    msg = msg @ p[f"{pre}.mlp.2.weight"].T.astype(msg.dtype)
    return x + _layer_norm(p, f"{pre}.norm2", msg)


def loftr_coarse_context_parallel(params, cfg, feat0, feat1, mesh,
                                  axis: str = "data"):
    """Run the coarse LocalFeatureTransformer with BOTH token sequences
    sharded over ``mesh[axis]`` (sequence/context parallelism).

    feat0/feat1: (B, L, C) coarse tokens (+pos-enc already added), L
    divisible by the axis size. Layer-for-layer identical math to the
    single-device `_transformer` (same per-device einsums, one psum per
    attention) — the all-pairs (H·W/64)² interaction rides ICI as two
    tiny (H, D, D) moments per layer.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = cfg.num_coarse_layers
    nhead = cfg.num_heads

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, axis, None), P(None, axis, None)),
             out_specs=(P(None, axis, None), P(None, axis, None)),
             check_vma=False)
    def run(p, f0, f1):
        for i in range(n):
            pre = f"loftr_coarse.layers.{2 * i}"
            f0 = _encoder_layer_dist(p, pre, f0, f0, nhead, axis)
            f1 = _encoder_layer_dist(p, pre, f1, f1, nhead, axis)
            pre = f"loftr_coarse.layers.{2 * i + 1}"
            f0 = _encoder_layer_dist(p, pre, f0, f1, nhead, axis)
            f1 = _encoder_layer_dist(p, pre, f1, f0, nhead, axis)
        return f0, f1

    return run(params, feat0, feat1)


# -----------------------------------------------------------------------------
# Matching
# -----------------------------------------------------------------------------

def _coarse_match(cfg: LoFTRConfig, conf: jax.Array,
                  hw0: Tuple[int, int], hw1: Tuple[int, int], K: int):
    """Dual-softmax coarse matching → fixed-K (reference
    coarse_matching.py:186-303): threshold, border removal, mutual max,
    then top-K by confidence with a validity mask."""
    B, L, S = conf.shape
    h0, w0 = hw0
    h1, w1 = hw1
    mask = conf > cfg.thr
    b = cfg.border_rm
    if b > 0:
        m5 = mask.reshape(B, h0, w0, h1, w1)
        border = jnp.zeros((h0, w0, h1, w1), bool)
        border = border.at[b:h0 - b, b:w0 - b, b:h1 - b, b:w1 - b].set(True)
        mask = (m5 & border[None]).reshape(B, L, S)
    mask = mask & (conf == jnp.max(conf, 2, keepdims=True)) \
        & (conf == jnp.max(conf, 1, keepdims=True))
    masked = jnp.where(mask, conf, 0.0)
    j_ids = jnp.argmax(masked, axis=2)                       # (B, L)
    mconf = jnp.take_along_axis(masked, j_ids[..., None], 2)[..., 0]
    scores, i_ids = jax.lax.top_k(mconf, K)                  # (B, K)
    j_sel = jnp.take_along_axis(j_ids, i_ids, 1)
    valid = scores > 0
    return i_ids, j_sel, scores, valid


def _gather_windows(feat: jax.Array, ids: jax.Array, w_c: int, W: int,
                    stride: int) -> jax.Array:
    """F.unfold(kernel=W, stride=stride, padding=W//2) at selected coarse
    cells (reference fine_preprocess.py:78-100): (B, Hf, Wf, C) + (B, K)
    → (B, K, W², C) in row-major window order."""
    B, Hf, Wf, C = feat.shape
    r = W // 2
    fp = jnp.pad(feat, [(0, 0), (r, r), (r, r), (0, 0)])
    cy = (ids // w_c) * stride  # top-left in padded coords
    cx = (ids % w_c) * stride
    dy, dx = jnp.meshgrid(jnp.arange(W), jnp.arange(W), indexing="ij")
    yy = cy[..., None] + dy.reshape(-1)[None, None]  # (B, K, W²)
    xx = cx[..., None] + dx.reshape(-1)[None, None]
    flat = fp.reshape(B, (Hf + 2 * r) * (Wf + 2 * r), C)
    idx = (yy * (Wf + 2 * r) + xx).reshape(B, -1)[..., None]
    out = jnp.take_along_axis(
        flat, jnp.broadcast_to(idx, (B, idx.shape[1], C)), axis=1)
    return out.reshape(B, ids.shape[1], W * W, C)


def _spatial_expectation(heat: jax.Array) -> jax.Array:
    """dsnt.spatial_expectation2d(…, normalized=True) over (M, W, W)."""
    M, H, W = heat.shape
    xs = jnp.linspace(-1.0, 1.0, W, dtype=heat.dtype)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=heat.dtype)
    ex = jnp.sum(heat * xs[None, None, :], axis=(-2, -1))
    ey = jnp.sum(heat * ys[None, :, None], axis=(-2, -1))
    return jnp.stack([ex, ey], -1)


# -----------------------------------------------------------------------------
# Full model
# -----------------------------------------------------------------------------

class LoFTR:
    """User-facing matcher (reference LoFTR.forward:121): takes
    {"image0", "image1"} (grayscale, H and W divisible by 8) and returns
    fixed-K padded correspondences + confidence + validity."""

    def __init__(self, cfg: Optional[LoFTRConfig] = None,
                 params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or LoFTRConfig()
        self.params = params if params is not None else loftr_init_params(
            key if key is not None else jax.random.PRNGKey(0), self.cfg)

    @classmethod
    def from_torch(cls, state_dict, cfg: Optional[LoFTRConfig] = None
                   ) -> "LoFTR":
        cfg = cfg or LoFTRConfig()
        return cls(cfg, params=load_torch_weights(state_dict, cfg))

    def __call__(self, data: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cfg, p = self.cfg, self.params
        img0, img1 = as_float(data["image0"]), as_float(data["image1"])
        B = img0.shape[0]
        K = cfg.top_k

        c0, f0 = loftr_backbone(p, cfg, img0)
        c1, f1 = loftr_backbone(p, cfg, img1)
        h0c, w0c = c0.shape[1:3]
        h1c, w1c = c1.shape[1:3]

        pe0 = position_encoding(cfg.coarse_dim, (h0c, w0c), cfg.temp_bug_fix,
                                c0.dtype)
        pe1 = position_encoding(cfg.coarse_dim, (h1c, w1c), cfg.temp_bug_fix,
                                c1.dtype)
        t0 = (c0 + pe0).reshape(B, h0c * w0c, cfg.coarse_dim)
        t1 = (c1 + pe1).reshape(B, h1c * w1c, cfg.coarse_dim)
        t0, t1 = _transformer(p, "loftr_coarse", cfg.num_coarse_layers,
                              cfg.num_heads, t0, t1)

        scale_c = cfg.coarse_dim ** 0.5
        sim = jnp.einsum("nlc,nsc->nls", t0 / scale_c, t1 / scale_c) \
            / cfg.dsmax_temperature
        conf = jax.nn.softmax(sim, 1) * jax.nn.softmax(sim, 2)
        i_ids, j_ids, mconf, valid = _coarse_match(cfg, conf, (h0c, w0c),
                                                   (h1c, w1c), K)

        scale = img0.shape[-2] // h0c  # 8
        mk0 = jnp.stack([(i_ids % w0c), (i_ids // w0c)], -1).astype(
            img0.dtype) * scale
        mk1 = jnp.stack([(j_ids % w1c), (j_ids // w1c)], -1).astype(
            img0.dtype) * scale

        # fine refinement
        W = cfg.fine_window
        stride = f0.shape[1] // h0c  # 4
        u0 = _gather_windows(f0, i_ids, w0c, W, stride)  # (B, K, W², Cf)
        u1 = _gather_windows(f1, j_ids, w1c, W, stride)
        if cfg.cat_c_feat:
            c0_sel = jnp.take_along_axis(
                t0, jnp.broadcast_to(i_ids[..., None],
                                     (B, K, cfg.coarse_dim)), 1)
            c1_sel = jnp.take_along_axis(
                t1, jnp.broadcast_to(j_ids[..., None],
                                     (B, K, cfg.coarse_dim)), 1)
            dw = p["fine_preprocess.down_proj.weight"].T
            db = p["fine_preprocess.down_proj.bias"]
            cw0 = c0_sel @ dw.astype(c0_sel.dtype) + db.astype(c0_sel.dtype)
            cw1 = c1_sel @ dw.astype(c1_sel.dtype) + db.astype(c1_sel.dtype)
            mw = p["fine_preprocess.merge_feat.weight"].T
            mb = p["fine_preprocess.merge_feat.bias"]
            merge = lambda u, cw: jnp.concatenate(
                [u, jnp.broadcast_to(cw[:, :, None], u.shape)], -1) \
                @ mw.astype(u.dtype) + mb.astype(u.dtype)
            u0, u1 = merge(u0, cw0), merge(u1, cw1)

        uf0 = u0.reshape(B * K, W * W, cfg.fine_dim)
        uf1 = u1.reshape(B * K, W * W, cfg.fine_dim)
        uf0, uf1 = _transformer(p, "loftr_fine", cfg.num_fine_layers,
                                cfg.num_heads, uf0, uf1)

        # fine matching (reference fine_matching.py:36-109)
        picked = uf0[:, (W * W) // 2]
        simf = jnp.einsum("mc,mrc->mr", picked, uf1) / cfg.fine_dim ** 0.5
        heat = jax.nn.softmax(simf, -1).reshape(-1, W, W)
        coords = _spatial_expectation(heat).reshape(B, K, 2)
        scale_f = img0.shape[-2] // f0.shape[1]  # 2
        mk1 = mk1 + coords * (W // 2) * scale_f

        return {"keypoints0": mk0, "keypoints1": mk1, "confidence": mconf,
                "valid": valid,
                "batch_indexes": jnp.repeat(jnp.arange(B), K).reshape(B, K)}
