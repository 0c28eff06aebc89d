"""LightGlue matcher — exact reference architecture (reference:
kornia/feature/lightglue.py:49-932 — learnable Fourier rotary position
encoding, interleaved-QKV self blocks, shared-FFN cross blocks, per-layer
MatchAssignment with sigmoid log double softmax, TokenConfidence) so the
published `*_lightglue.pth` checkpoints drop in via `LightGlue.from_torch`.

TPU-native design: fixed depth and fixed-N padded keypoint sets — the
reference's early-exit (depth confidence) and point pruning (width
confidence) are GPU latency optimizations driven by data-dependent control
flow; on TPU the full 9-layer stack is one fused executable and the
assignment quality is identical to the no-early-exit reference path
(depth_confidence=-1, width_confidence=-1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["LightGlue", "LightGlueConfig"]

_FEATURES: Dict[str, Dict[str, Any]] = {
    "superpoint": {"input_dim": 256},
    "dedodeb": {"input_dim": 256},
    "dedodeg": {"input_dim": 256},
    "disk": {"input_dim": 128},
    "aliked": {"input_dim": 128},
    "xfeat": {"input_dim": 64, "descriptor_dim": 96, "n_layers": 6,
              "num_heads": 1},
    "sift": {"input_dim": 128, "add_scale_ori": True},
    "doghardnet": {"input_dim": 128, "add_scale_ori": True,
                   "scale_coef": 1.0 / 6.0},
}


class LightGlueConfig:
    """Mirror of the reference `default_conf` (lightglue.py:482-497)."""

    def __init__(self, features: Optional[str] = None, input_dim: int = 256,
                 descriptor_dim: int = 256, n_layers: int = 9,
                 num_heads: int = 4, add_scale_ori: bool = False,
                 scale_coef: float = 1.0, filter_threshold: float = 0.1,
                 dim: Optional[int] = None, num_layers: Optional[int] = None):
        if dim is not None:  # legacy aliases
            input_dim = descriptor_dim = dim
        if num_layers is not None:
            n_layers = num_layers
        if features is not None:
            preset = dict(_FEATURES[features])
            input_dim = preset.pop("input_dim", input_dim)
            descriptor_dim = preset.pop("descriptor_dim", descriptor_dim)
            n_layers = preset.pop("n_layers", n_layers)
            num_heads = preset.pop("num_heads", num_heads)
            add_scale_ori = preset.pop("add_scale_ori", add_scale_ori)
            scale_coef = preset.pop("scale_coef", scale_coef)
        self.input_dim = input_dim
        self.descriptor_dim = descriptor_dim
        self.n_layers = n_layers
        self.num_heads = num_heads
        self.add_scale_ori = add_scale_ori
        self.scale_coef = scale_coef
        self.filter_threshold = filter_threshold


# -----------------------------------------------------------------------------
# Parameters
# -----------------------------------------------------------------------------

def _param_specs(cfg: LightGlueConfig) -> Dict[str, Tuple[int, ...]]:
    d = cfg.descriptor_dim
    head_dim = d // cfg.num_heads
    M = 2 + 2 * cfg.add_scale_ori
    specs: Dict[str, Tuple[int, ...]] = {}
    if cfg.input_dim != d:
        specs["input_proj.weight"] = (d, cfg.input_dim)
        specs["input_proj.bias"] = (d,)
    specs["posenc.Wr.weight"] = (head_dim // 2, M)
    for i in range(cfg.n_layers):
        sa = f"transformers.{i}.self_attn"
        specs[f"{sa}.Wqkv.weight"] = (3 * d, d)
        specs[f"{sa}.Wqkv.bias"] = (3 * d,)
        specs[f"{sa}.out_proj.weight"] = (d, d)
        specs[f"{sa}.out_proj.bias"] = (d,)
        ca = f"transformers.{i}.cross_attn"
        for proj in ("to_qk", "to_v", "to_out"):
            specs[f"{ca}.{proj}.weight"] = (d, d)
            specs[f"{ca}.{proj}.bias"] = (d,)
        for blk in (sa, ca):
            specs[f"{blk}.ffn.0.weight"] = (2 * d, 2 * d)
            specs[f"{blk}.ffn.0.bias"] = (2 * d,)
            specs[f"{blk}.ffn.1.weight"] = (2 * d,)
            specs[f"{blk}.ffn.1.bias"] = (2 * d,)
            specs[f"{blk}.ffn.3.weight"] = (d, 2 * d)
            specs[f"{blk}.ffn.3.bias"] = (d,)
        la = f"log_assignment.{i}"
        specs[f"{la}.matchability.weight"] = (1, d)
        specs[f"{la}.matchability.bias"] = (1,)
        specs[f"{la}.final_proj.weight"] = (d, d)
        specs[f"{la}.final_proj.bias"] = (d,)
        if i < cfg.n_layers - 1:
            specs[f"token_confidence.{i}.token.0.weight"] = (1, d)
            specs[f"token_confidence.{i}.token.0.bias"] = (1,)
    return specs


def lightglue_init_params(key: jax.Array, cfg: Optional[LightGlueConfig] = None
                          ) -> Dict[str, jax.Array]:
    cfg = cfg or LightGlueConfig()
    params: Dict[str, jax.Array] = {}
    for name, shape in _param_specs(cfg).items():
        key, sub = jax.random.split(key)
        if len(shape) == 2:
            params[name] = jax.random.normal(sub, shape) / shape[1] ** 0.5
        elif name.endswith("ffn.1.weight"):  # LayerNorm scale
            params[name] = jnp.ones(shape)
        else:
            params[name] = jnp.zeros(shape)
    return params


def load_torch_weights(state_dict, cfg: Optional[LightGlueConfig] = None
                       ) -> Dict[str, jax.Array]:
    """Convert a torch LightGlue ``state_dict`` (old `self_attn.{i}` /
    `matcher.`-prefixed layouts tolerated, lightglue.py:626-637)."""
    import numpy as np

    cfg = cfg or LightGlueConfig()
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("matcher."):
            k = k[len("matcher."):]
        for i in range(cfg.n_layers):
            k = k.replace(f"self_attn.{i}", f"transformers.{i}.self_attn")
            k = k.replace(f"cross_attn.{i}", f"transformers.{i}.cross_attn")
        sd[k] = v
    params: Dict[str, jax.Array] = {}
    for k, shape in _param_specs(cfg).items():
        v = sd[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v)
    return params


# -----------------------------------------------------------------------------
# Blocks
# -----------------------------------------------------------------------------

def normalize_keypoints(kpts: jax.Array, size: jax.Array) -> jax.Array:
    """(reference lightglue.py:49-56): size is (B, 2) as (w, h)."""
    size = jnp.asarray(size, kpts.dtype)
    if size.ndim == 1:
        size = size[None]
    shift = size / 2.0
    scale = jnp.max(size, axis=1) / 2.0
    return (kpts - shift[:, None]) / scale[:, None, None]


def _posenc(p, kpts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """LearnableFourierPositionalEncoding (lightglue.py:83-110): returns
    (cos, sin), each (B, 1, N, head_dim) with pairwise-repeated channels."""
    proj = kpts @ p["posenc.Wr.weight"].T.astype(kpts.dtype)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)[:, None]
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)[:, None]
    return cos, sin


def _rotate_half(x: jax.Array) -> jax.Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], -1).reshape(*x1.shape[:-1], -1)


def _apply_rotary(enc, t):
    cos, sin = enc
    return t * cos + _rotate_half(t) * sin


def _linear(p, name, x):
    return x @ p[f"{name}.weight"].T.astype(x.dtype) \
        + p[f"{name}.bias"].astype(x.dtype)


def _ffn(p, pre, x, message):
    """Shared FFN: linear → LayerNorm(affine) → GELU → linear
    (lightglue.py:215-220), applied to cat([x, message])."""
    h = _linear(p, f"{pre}.ffn.0", jnp.concatenate([x, message], -1))
    mu = jnp.mean(h, -1, keepdims=True)
    var = jnp.var(h, -1, keepdims=True)
    h = (h - mu) * lax.rsqrt(var + 1e-5)
    h = h * p[f"{pre}.ffn.1.weight"].astype(h.dtype) \
        + p[f"{pre}.ffn.1.bias"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return x + _linear(p, f"{pre}.ffn.3", h)


def _self_block(p, pre, x, enc, nhead):
    """SelfBlock (lightglue.py:196-250) with the checkpoint's interleaved
    (head, channel, qkv) Wqkv packing."""
    B, N, d = x.shape
    dh = d // nhead
    qkv = _linear(p, f"{pre}.Wqkv", x).reshape(B, N, nhead, dh, 3)
    qkv = jnp.transpose(qkv, (0, 2, 1, 3, 4))  # (B, h, N, dh, 3)
    q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
    q = _apply_rotary(enc, q)
    k = _apply_rotary(enc, k)
    attn = jax.nn.softmax(
        jnp.einsum("bhid,bhjd->bhij", q, k) * dh ** -0.5, -1)
    ctx = jnp.einsum("bhij,bhjd->bhid", attn, v)
    msg = _linear(p, f"{pre}.out_proj",
                  jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, N, d))
    return _ffn(p, pre, x, msg)


def _cross_block(p, pre, x0, x1, nhead):
    """CrossBlock (lightglue.py:253-333): shared to_qk both sides, shared
    FFN."""
    B, M, d = x0.shape
    N = x1.shape[1]
    dh = d // nhead
    split = lambda t: jnp.transpose(
        t.reshape(B, -1, nhead, dh), (0, 2, 1, 3))
    qk0 = split(_linear(p, f"{pre}.to_qk", x0)) * dh ** -0.25
    qk1 = split(_linear(p, f"{pre}.to_qk", x1)) * dh ** -0.25
    v0 = split(_linear(p, f"{pre}.to_v", x0))
    v1 = split(_linear(p, f"{pre}.to_v", x1))
    sim = jnp.einsum("bhid,bhjd->bhij", qk0, qk1)
    attn01 = jax.nn.softmax(sim, -1)
    attn10 = jax.nn.softmax(jnp.swapaxes(sim, -1, -2), -1)
    m0 = jnp.einsum("bhij,bhjd->bhid", attn01, v1)
    m1 = jnp.einsum("bhij,bhjd->bhid", attn10, v0)
    unsplit = lambda t, n: jnp.transpose(t, (0, 2, 1, 3)).reshape(B, n, d)
    m0 = _linear(p, f"{pre}.to_out", unsplit(m0, M))
    m1 = _linear(p, f"{pre}.to_out", unsplit(m1, N))
    return _ffn(p, pre, x0, m0), _ffn(p, pre, x1, m1)


def _sigmoid_log_double_softmax(sim, z0, z1):
    """(lightglue.py:405-415): log assignment matrix (B, M+1, N+1)."""
    B, M, N = sim.shape
    cert = jax.nn.log_sigmoid(z0) + jnp.swapaxes(jax.nn.log_sigmoid(z1), 1, 2)
    s0 = jax.nn.log_softmax(sim, 2)
    s1 = jnp.swapaxes(jax.nn.log_softmax(jnp.swapaxes(sim, -1, -2), 2),
                      -1, -2)
    scores = jnp.zeros((B, M + 1, N + 1), sim.dtype)
    scores = scores.at[:, :M, :N].set(s0 + s1 + cert)
    scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0[..., 0]))
    scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1[..., 0]))
    return scores


def _assignment(p, pre, desc0, desc1):
    """MatchAssignment (lightglue.py:418-441)."""
    d = desc0.shape[-1]
    md0 = _linear(p, f"{pre}.final_proj", desc0) / d ** 0.25
    md1 = _linear(p, f"{pre}.final_proj", desc1) / d ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1)
    z0 = _linear(p, f"{pre}.matchability", desc0)
    z1 = _linear(p, f"{pre}.matchability", desc1)
    return _sigmoid_log_double_softmax(sim, z0, z1)


def filter_matches(scores: jax.Array, th: float):
    """(lightglue.py:456-473): mutual argmax + exp-score threshold."""
    inner = scores[:, :-1, :-1]
    m0 = jnp.argmax(inner, 2)
    m1 = jnp.argmax(inner, 1)
    max0 = jnp.max(inner, 2)
    idx0 = jnp.arange(m0.shape[1])[None]
    idx1 = jnp.arange(m1.shape[1])[None]
    mutual0 = idx0 == jnp.take_along_axis(m1, m0, 1)
    mutual1 = idx1 == jnp.take_along_axis(m0, m1, 1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, 1), 0.0)
    valid0 = mutual0 & (mscores0 > th)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, 1)
    m0 = jnp.where(valid0, m0, -1)
    m1 = jnp.where(valid1, m1, -1)
    return m0, m1, mscores0, mscores1


# -----------------------------------------------------------------------------
# Matcher
# -----------------------------------------------------------------------------

class LightGlue:
    """(reference lightglue.py:476-932). Accepts either the reference's
    nested {"image0": {...}, "image1": {...}} dict or a flat dict with
    keypoints0/keypoints1/descriptors0/descriptors1/image_size."""

    def __init__(self, cfg: Optional[LightGlueConfig] = None,
                 params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or LightGlueConfig()
        self.params = params if params is not None else lightglue_init_params(
            key if key is not None else jax.random.PRNGKey(0), self.cfg)

    @classmethod
    def from_torch(cls, state_dict, cfg: Optional[LightGlueConfig] = None
                   ) -> "LightGlue":
        cfg = cfg or LightGlueConfig()
        return cls(cfg, params=load_torch_weights(state_dict, cfg))

    def __call__(self, data: Dict[str, Any]) -> Dict[str, jax.Array]:
        cfg, p = self.cfg, self.params
        if "image0" in data:
            d0, d1 = data["image0"], data["image1"]
            kpts0, kpts1 = d0["keypoints"], d1["keypoints"]
            desc0, desc1 = d0["descriptors"], d1["descriptors"]
            size0 = d0.get("image_size")
            size1 = d1.get("image_size")
            if size0 is None:
                size0 = jnp.asarray(d0["image"].shape[-2:][::-1])
            if size1 is None:
                size1 = jnp.asarray(d1["image"].shape[-2:][::-1])
            extras0, extras1 = d0, d1
        else:  # flat layout
            kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
            desc0, desc1 = data["descriptors0"], data["descriptors1"]
            size0 = size1 = jnp.asarray(data["image_size"])
            extras0 = {k[:-1]: v for k, v in data.items() if k.endswith("0")}
            extras1 = {k[:-1]: v for k, v in data.items() if k.endswith("1")}

        kpts0 = normalize_keypoints(as_float(kpts0), size0)
        kpts1 = normalize_keypoints(as_float(kpts1), size1)
        if cfg.add_scale_ori:
            sc0 = as_float(extras0["scales"])[..., None] * cfg.scale_coef
            sc1 = as_float(extras1["scales"])[..., None] * cfg.scale_coef
            kpts0 = jnp.concatenate(
                [kpts0, sc0, as_float(extras0["oris"])[..., None]], -1)
            kpts1 = jnp.concatenate(
                [kpts1, sc1, as_float(extras1["oris"])[..., None]], -1)

        desc0, desc1 = as_float(desc0), as_float(desc1)
        if cfg.input_dim != cfg.descriptor_dim:
            desc0 = _linear(p, "input_proj", desc0)
            desc1 = _linear(p, "input_proj", desc1)
        enc0 = _posenc(p, kpts0)
        enc1 = _posenc(p, kpts1)

        for i in range(cfg.n_layers):
            desc0 = _self_block(p, f"transformers.{i}.self_attn", desc0,
                                enc0, cfg.num_heads)
            desc1 = _self_block(p, f"transformers.{i}.self_attn", desc1,
                                enc1, cfg.num_heads)
            desc0, desc1 = _cross_block(p, f"transformers.{i}.cross_attn",
                                        desc0, desc1, cfg.num_heads)

        scores = _assignment(p, f"log_assignment.{cfg.n_layers - 1}",
                             desc0, desc1)
        m0, m1, ms0, ms1 = filter_matches(scores, cfg.filter_threshold)
        return {"log_assignment": scores, "matches0": m0, "matches1": m1,
                "matching_scores0": ms0, "matching_scores1": ms1,
                "valid": m0 > -1, "stop": cfg.n_layers}
