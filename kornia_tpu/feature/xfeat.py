"""XFeat — exact reference architecture (reference: kornia/feature/
xfeat.py:43-619 — XFeatModel backbone, InterpolateSparse2d, sparse
detectAndCompute, dense dual-scale extraction, MNN matching and the
fine-matcher refinement) so the published `xfeat.pt` checkpoint drops in
via `XFeat.from_torch`.

TPU-native design: NHWC compute / HWIO weights keyed by the torch
state-dict names; all sparse outputs are padded fixed-K with validity
masks (the reference returns variable-length nonzero lists) so the whole
detect→describe→match path jits as one executable.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["XFeat"]

# BasicLayer plan per Sequential block: (idx, cin, cout, kernel, stride, pad)
_BLOCKS = {
    "block1": ((0, 1, 4, 3, 1, 1), (1, 4, 8, 3, 2, 1), (2, 8, 8, 3, 1, 1),
               (3, 8, 24, 3, 2, 1)),
    "block2": ((0, 24, 24, 3, 1, 1), (1, 24, 24, 3, 1, 1)),
    "block3": ((0, 24, 64, 3, 2, 1), (1, 64, 64, 3, 1, 1),
               (2, 64, 64, 1, 1, 0)),
    "block4": ((0, 64, 64, 3, 2, 1), (1, 64, 64, 3, 1, 1),
               (2, 64, 64, 3, 1, 1)),
    "block5": ((0, 64, 128, 3, 2, 1), (1, 128, 128, 3, 1, 1),
               (2, 128, 128, 3, 1, 1), (3, 128, 64, 1, 1, 0)),
    "block_fusion": ((0, 64, 64, 3, 1, 1), (1, 64, 64, 3, 1, 1)),
    "heatmap_head": ((0, 64, 64, 1, 1, 0), (1, 64, 64, 1, 1, 0)),
    "keypoint_head": ((0, 64, 64, 1, 1, 0), (1, 64, 64, 1, 1, 0),
                      (2, 64, 64, 1, 1, 0)),
}
# trailing plain Conv2d per block: (idx, cin, cout) — all 1x1 with bias
_TAIL_CONVS = {"block_fusion": (2, 64, 64), "heatmap_head": (2, 64, 1),
               "keypoint_head": (3, 64, 65)}
# fine matcher MLP: (linear idx, in, out); BatchNorm1d(affine=False) after
# each hidden linear at idx+1
_FINE = ((0, 128, 512), (3, 512, 512), (6, 512, 512), (9, 512, 512),
         (12, 512, 64))


def _param_specs() -> Dict[str, Tuple[int, ...]]:
    specs: Dict[str, Tuple[int, ...]] = {}
    specs["skip1.1.weight"] = (24, 1, 1, 1)
    specs["skip1.1.bias"] = (24,)
    for block, layers in _BLOCKS.items():
        for i, cin, cout, k, _s, _p in layers:
            specs[f"{block}.{i}.layer.0.weight"] = (cout, cin, k, k)
            specs[f"{block}.{i}.layer.1.running_mean"] = (cout,)
            specs[f"{block}.{i}.layer.1.running_var"] = (cout,)
    for block, (i, cin, cout) in _TAIL_CONVS.items():
        specs[f"{block}.{i}.weight"] = (cout, cin, 1, 1)
        specs[f"{block}.{i}.bias"] = (cout,)
    for i, cin, cout in _FINE:
        specs[f"fine_matcher.{i}.weight"] = (cout, cin)
        specs[f"fine_matcher.{i}.bias"] = (cout,)
        if cout != 64:
            specs[f"fine_matcher.{i + 1}.running_mean"] = (cout,)
            specs[f"fine_matcher.{i + 1}.running_var"] = (cout,)
    return specs


def xfeat_init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, shape in _param_specs().items():
        key, sub = jax.random.split(key)
        if name.endswith("running_var"):
            params[name] = jnp.ones(shape, dtype)
        elif name.endswith("running_mean") or name.endswith(".bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif len(shape) == 4:
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        else:  # linear (O, I)
            params[name] = jax.random.normal(sub, shape, dtype) * (
                2.0 / shape[1]) ** 0.5
    return params


def load_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """Convert an `XFeatModel.state_dict()` (the `xfeat.pt` layout) into
    TPU params: conv (O,I,kH,kW) → HWIO, linear/vec as-is."""
    import numpy as np

    params: Dict[str, jax.Array] = {}
    for k, shape in _param_specs().items():
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
    return params


def _conv(p, name, x, stride=1, pad=0):
    w = p[f"{name}.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b.astype(x.dtype)


def _bn_noaffine(p, name, x):
    mean = p[f"{name}.running_mean"].astype(x.dtype)
    var = p[f"{name}.running_var"].astype(x.dtype)
    return (x - mean) * lax.rsqrt(var + 1e-5)


def _block(p, name, x):
    for i, _cin, _cout, _k, s, pad in _BLOCKS[name]:
        pre = f"{name}.{i}.layer"
        x = jax.nn.relu(_bn_noaffine(p, f"{pre}.1",
                                     _conv(p, f"{pre}.0", x, s, pad)))
    if name in _TAIL_CONVS:
        x = _conv(p, f"{name}.{_TAIL_CONVS[name][0]}", x)
    return x


def _unfold2d(x: jax.Array, ws: int) -> jax.Array:
    """torch x.unfold(2,ws,ws).unfold(3,ws,ws) channel packing on NHWC:
    (B, H, W, C) → (B, H/ws, W/ws, C*ws²) with window-position-major,
    row-major (dy·ws+dx) channel order (reference xfeat.py:186-190)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # (B, h, w, C, ws, ws)
    return x.reshape(B, H // ws, W // ws, C * ws * ws)


def xfeat_model(params: Dict[str, jax.Array], images: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact XFeatModel.forward (reference xfeat.py:192-219):
    (B, C, H, W) → (feats (B, 64, H/8, W/8), keypoint logits (B, 65, …),
    heatmap (B, 1, …))."""
    from ..ops.warp import resize
    x = jnp.mean(as_float(images), axis=1, keepdims=True)
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    x = lax.stop_gradient((x - mu) * lax.rsqrt(var + 1e-5))
    xh = jnp.transpose(x, (0, 2, 3, 1))
    p = params

    skip = lax.reduce_window(xh, 0.0, lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
                             "VALID") / 16.0
    skip = _conv(p, "skip1.1", skip)
    x1 = _block(p, "block1", xh)
    x2 = _block(p, "block2", x1 + skip)
    x3 = _block(p, "block3", x2)
    x4 = _block(p, "block4", x3)
    x5 = _block(p, "block5", x4)

    hw3 = x3.shape[1:3]
    up = lambda t: jnp.transpose(resize(jnp.transpose(t, (0, 3, 1, 2)), hw3,
                                        "bilinear", align_corners=False),
                                 (0, 2, 3, 1))
    feats = _block(p, "block_fusion", x3 + up(x4) + up(x5))
    heat = jax.nn.sigmoid(_block(p, "heatmap_head", feats))
    kpts = _block(p, "keypoint_head", _unfold2d(xh, 8))
    to_nchw = lambda t: jnp.transpose(t, (0, 3, 1, 2))
    return to_nchw(feats), to_nchw(kpts), to_nchw(heat)


def _interpolate_sparse2d(x: jax.Array, pos: jax.Array, H: int, W: int,
                          mode: str) -> jax.Array:
    """InterpolateSparse2d (reference xfeat.py:222-267): grid normalized
    with a (W-1, H-1) denominator but sampled align_corners=False —
    the exact asymmetry the pretrained weights bake in."""
    from ..ops.warp import grid_sample
    denom = jnp.asarray([W - 1, H - 1], pos.dtype)
    grid = (2.0 * pos / denom - 1.0)[:, :, None, :]  # (B, N, 1, 2)
    out = grid_sample(x, grid, mode, "zeros", align_corners=False)
    return jnp.transpose(out[..., 0], (0, 2, 1))  # (B, N, C)


class XFeat:
    """Sparse/semi-dense XFeat with fixed-K padded outputs (reference:
    xfeat.py:270-619). `XFeat.from_torch(state_dict)` loads `xfeat.pt`."""

    def __init__(self, top_k: int = 4096, detection_threshold: float = 0.05,
                 params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None):
        self.top_k = top_k
        self.detection_threshold = detection_threshold
        self.params = params if params is not None else xfeat_init_params(
            key if key is not None else jax.random.PRNGKey(0))

    @classmethod
    def from_torch(cls, state_dict, top_k: int = 4096,
                   detection_threshold: float = 0.05) -> "XFeat":
        return cls(top_k, detection_threshold,
                   params=load_torch_weights(state_dict))

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _preprocess(x: jax.Array) -> Tuple[jax.Array, float, float]:
        """Resize to the largest multiple of 32 (reference xfeat.py:326)."""
        from ..ops.warp import resize
        H, W = x.shape[-2:]
        H32, W32 = max(32, (H // 32) * 32), max(32, (W // 32) * 32)
        if (H32, W32) != (H, W):
            x = resize(as_float(x), (H32, W32), "bilinear",
                       align_corners=False)
        return as_float(x), H / H32, W / W32

    @staticmethod
    def _get_kpts_heatmap(kpts: jax.Array, softmax_temp: float = 1.0
                          ) -> jax.Array:
        """(B, 65, h, w) logits → (B, 1, 8h, 8w) heatmap
        (reference xfeat.py:336-342)."""
        scores = jax.nn.softmax(kpts * softmax_temp, axis=1)[:, :64]
        B, _, H, W = scores.shape
        heat = jnp.transpose(scores, (0, 2, 3, 1)).reshape(B, H, W, 8, 8)
        heat = jnp.transpose(heat, (0, 1, 3, 2, 4)).reshape(B, 1, H * 8,
                                                            W * 8)
        return heat

    def detectAndCompute(self, images: jax.Array,
                         top_k: Optional[int] = None,
                         detection_threshold: Optional[float] = None
                         ) -> Dict[str, jax.Array]:
        """(B, C, H, W) → dict(keypoints (B, K, 2) xy, scores (B, K),
        descriptors (B, K, 64), valid (B, K)) — padded fixed-K analogue of
        the reference's per-image lists (xfeat.py:483-538)."""
        from ..geometry.subpix import nms2d
        K = top_k or self.top_k
        thr = (detection_threshold if detection_threshold is not None
               else self.detection_threshold)
        x, rh, rw = self._preprocess(images)
        B, _, H1, W1 = x.shape
        M1, K1, H1map = xfeat_model(self.params, x)
        M1 = M1 / jnp.maximum(jnp.linalg.norm(M1, axis=1, keepdims=True),
                              1e-12)
        K1h = self._get_kpts_heatmap(K1)

        keep = nms2d(K1h, (5, 5), mask_only=True) & (K1h > thr)
        # score = K1h (nearest ≡ value at the integer pixel) × H1 sampled
        # bilinearly with the reference's shifted normgrid; computing the
        # H1 resample densely keeps everything one fused executable.
        ys, xs = jnp.meshgrid(jnp.arange(H1), jnp.arange(W1), indexing="ij")
        pos_all = jnp.stack([xs, ys], -1).reshape(1, -1, 2).astype(K1h.dtype)
        pos_all = jnp.broadcast_to(pos_all, (B, H1 * W1, 2))
        h1s = _interpolate_sparse2d(H1map, pos_all, H1, W1, "bilinear")
        h1s = h1s.reshape(B, H1, W1)
        score_map = jnp.where(keep[:, 0], K1h[:, 0] * h1s, -1.0)

        scores, idx = jax.lax.top_k(score_map.reshape(B, -1), K)
        kx = (idx % W1).astype(x.dtype)
        ky = (idx // W1).astype(x.dtype)
        mkpts = jnp.stack([kx, ky], -1)
        feats = _interpolate_sparse2d(M1, mkpts, H1, W1, "bicubic")
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        mkpts = mkpts * jnp.asarray([rw, rh], mkpts.dtype)
        return {"keypoints": mkpts, "scores": scores, "descriptors": feats,
                "valid": scores > 0}

    # -- semi-dense (XFeat*) ----------------------------------------------

    def _extract_dense(self, x: jax.Array, top_k: int
                       ) -> Tuple[jax.Array, jax.Array]:
        """Coarse descriptors, top-k by reliability
        (reference xfeat.py:425-441)."""
        x, rh, rw = self._preprocess(x)
        M1, _K1, H1 = xfeat_model(self.params, x)
        B, C, h, w = M1.shape
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        xy = (jnp.stack([xs, ys], -1).reshape(-1, 2) * 8).astype(M1.dtype)
        rel = H1.reshape(B, -1)
        k = min(top_k, rel.shape[1])
        _, idx = jax.lax.top_k(rel, k)
        Mf = jnp.transpose(M1.reshape(B, C, -1), (0, 2, 1))
        feats = jnp.take_along_axis(
            Mf, jnp.broadcast_to(idx[..., None], (B, k, C)), axis=1)
        mk = jnp.take_along_axis(
            jnp.broadcast_to(xy[None], (B, xy.shape[0], 2)),
            jnp.broadcast_to(idx[..., None], (B, k, 2)), axis=1)
        return mk * jnp.asarray([rw, rh], mk.dtype), feats

    def detectAndComputeDense(self, images: jax.Array,
                              top_k: Optional[int] = None,
                              multiscale: bool = True
                              ) -> Dict[str, jax.Array]:
        """(reference xfeat.py:540-571)."""
        from ..ops.warp import resize
        K = top_k or self.top_k
        if not multiscale:
            mk, feats = self._extract_dense(images, K)
            return {"keypoints": mk, "descriptors": feats,
                    "scales": jnp.ones(mk.shape[:2], mk.dtype)}
        H, W = images.shape[-2:]
        s1, s2 = 0.6, 1.3
        x1 = resize(as_float(images), (int(H * s1), int(W * s1)), "bilinear",
                    align_corners=False)
        x2 = resize(as_float(images), (int(H * s2), int(W * s2)), "bilinear",
                    align_corners=False)
        mk1, f1 = self._extract_dense(x1, int(K * 0.20))
        mk2, f2 = self._extract_dense(x2, int(K * 0.80))
        mk = jnp.concatenate([mk1 / s1, mk2 / s2], 1)
        sc = jnp.concatenate([jnp.full(mk1.shape[:2], 1 / s1, mk.dtype),
                              jnp.full(mk2.shape[:2], 1 / s2, mk.dtype)], 1)
        return {"keypoints": mk, "descriptors": jnp.concatenate([f1, f2], 1),
                "scales": sc}

    @staticmethod
    def _subpix_softmax2d(heatmaps: jax.Array, temp: float = 3.0
                          ) -> jax.Array:
        """(N, H, W) → (N, 2) soft-argmax offsets centered at (W//2, H//2)
        (reference xfeat.py:380-391)."""
        N, H, W = heatmaps.shape
        sm = jax.nn.softmax(temp * heatmaps.reshape(N, -1), -1).reshape(
            N, H, W)
        ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        xs = (xs - W // 2).astype(sm.dtype)
        ys = (ys - H // 2).astype(sm.dtype)
        return jnp.stack([jnp.sum(xs * sm, (-2, -1)),
                          jnp.sum(ys * sm, (-2, -1))], -1)

    def match_xfeat(self, img0: jax.Array, img1: jax.Array,
                    top_k: Optional[int] = None, min_cossim: float = -1.0
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Sparse detect + MNN match (reference xfeat.py:573-601);
        returns (mkpts0 (K, 2), mkpts1 (K, 2), valid (K,))."""
        f0 = self.detectAndCompute(img0, top_k)
        f1 = self.detectAndCompute(img1, top_k)
        d0, d1 = f0["descriptors"][0], f1["descriptors"][0]
        cossim = d0 @ d1.T
        m12 = jnp.argmax(cossim, 1)
        m21 = jnp.argmax(cossim, 0)
        idx0 = jnp.arange(m12.shape[0])
        mutual = m21[m12] == idx0
        good = (jnp.max(cossim, 1) > min_cossim) if min_cossim > 0 else True
        valid = mutual & good & f0["valid"][0] & f1["valid"][0][m12]
        return f0["keypoints"][0], f1["keypoints"][0][m12], valid

    def match_xfeat_star(self, img0: jax.Array, img1: jax.Array,
                         top_k: Optional[int] = None, fine_conf: float = 0.25
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Semi-dense match + fine-matcher refinement (reference
        xfeat.py:603-637 + _refine_matches:443-466); returns
        (mkpts0 (K, 2), mkpts1 (K, 2), valid (K,)) for batch item 0."""
        out0 = self.detectAndComputeDense(img0, top_k)
        out1 = self.detectAndComputeDense(img1, top_k)
        d0, d1 = out0["descriptors"][0], out1["descriptors"][0]
        cossim = d0 @ d1.T
        m12 = jnp.argmax(cossim, 1)
        m21 = jnp.argmax(cossim, 0)
        idx0 = jnp.arange(m12.shape[0])
        mutual = m21[m12] == idx0

        f0 = d0
        f1 = d1[m12]
        mk0 = out0["keypoints"][0]
        mk1 = out1["keypoints"][0][m12]
        sc0 = out0["scales"][0]
        offsets = self._fine_matcher(jnp.concatenate([f0, f1], -1))
        conf = jnp.max(jax.nn.softmax(offsets * 3, -1), -1)
        off_xy = self._subpix_softmax2d(offsets.reshape(-1, 8, 8))
        mk0 = mk0 + off_xy * sc0[:, None]
        valid = mutual & (conf > fine_conf)
        return mk0, mk1, valid

    def _fine_matcher(self, x: jax.Array) -> jax.Array:
        """fine_matcher MLP (reference xfeat.py:170-184): 4×(linear →
        BatchNorm1d(no affine) → ReLU) → linear(512, 64)."""
        p = self.params
        for i, _cin, cout in _FINE:
            x = x @ p[f"fine_matcher.{i}.weight"].T.astype(x.dtype) \
                + p[f"fine_matcher.{i}.bias"].astype(x.dtype)
            if cout != 64:
                mean = p[f"fine_matcher.{i + 1}.running_mean"].astype(x.dtype)
                var = p[f"fine_matcher.{i + 1}.running_var"].astype(x.dtype)
                x = jax.nn.relu((x - mean) * lax.rsqrt(var + 1e-5))
        return x
