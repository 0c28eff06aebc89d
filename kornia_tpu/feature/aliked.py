"""ALIKED detector/descriptor (deformable convs + SDDH + DKD), TPU-native.

Reference behavior: kornia/feature/aliked/aliked.py (ALIKED:745, DKD:198,
SDDH:618, ConvBlock/ResBlock:520/556, DeformableConv2d:408) and
aliked/deform_conv2d.py:33.

TPU-first redesign (NOT a port):
- Deformable convs run through `ops.deform_conv.deform_conv2d`: four
  row-gathers from a (B, HW, C) layout + one MXU einsum per group.
- DKD's per-image variable-N Python loops become ONE batched fixed-K
  pipeline: strict NMS -> border zero -> `lax.top_k` -> batched soft-argmax
  over 25-tap unfolded patches -> validity mask. No host sync, jittable.
- SDDH's per-image loop becomes a batched patch row-gather + dense einsums
  (`offset MLP` and `agg_weights` both land on the MXU), one grid_sample
  for all B*N*n_pos deformable sample positions.
- The 2x2 eigh for LAF affines is closed-form (no LAPACK on the TPU path).
- Backbone is flax/NHWC; BatchNorm runs with frozen running stats (the
  reference only ships eval-mode checkpoints).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.check import check
from ..core.dtype import as_float
from ..geometry.subpix import nms2d
from ..ops.deform_conv import deform_conv2d
from ..ops.warp import grid_sample, resize

__all__ = ["ALIKED", "ALIKEDNet", "SDDH", "dkd_detect"]

_ALIKED_CFGS = {
    # c1, c2, c3, c4, dim, K, M
    "aliked-t16": (8, 16, 32, 64, 64, 3, 16),
    "aliked-n16": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n16rot": (16, 32, 64, 128, 128, 3, 16),
    "aliked-n32": (16, 32, 64, 128, 128, 3, 32),
}


def _bn(x: jax.Array) -> jax.Array:
    return nn.BatchNorm(use_running_average=True)(x)


class _DeformConv(nn.Module):
    """DCNv1 3x3 (aliked.py DeformableConv2d; mask=False as ALIKED uses)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):  # NHWC
        k = self.kernel_size
        H, W, C = x.shape[1], x.shape[2], x.shape[3]
        off = nn.Conv(2 * k * k, (k, k), padding=k // 2, use_bias=True,
                      name="offset_conv")(x)
        max_off = max(H, W) / 4.0
        off = jnp.clip(off, -max_off, max_off)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.features, C, k, k))
        y = deform_conv2d(jnp.transpose(x, (0, 3, 1, 2)),
                          jnp.transpose(off, (0, 3, 1, 2)),
                          w, padding=k // 2)
        return jnp.transpose(y, (0, 2, 3, 1))


def _conv(x: jax.Array, features: int, k: int, conv_type: str,
          name: str) -> jax.Array:
    if conv_type == "dcn":
        return _DeformConv(features, k, name=name)(x)
    return nn.Conv(features, (k, k), padding=k // 2, use_bias=False,
                   name=name)(x)


class _ConvBlock(nn.Module):
    """conv-BN-selu x2 (aliked.py ConvBlock:520)."""

    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x):
        x = nn.selu(_bn(_conv(x, self.features, 3, self.conv_type, "conv1")))
        return nn.selu(_bn(_conv(x, self.features, 3, self.conv_type, "conv2")))


class _ResBlock(nn.Module):
    """BasicBlock with 1x1-projection skip (aliked.py ResBlock:556)."""

    features: int
    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x):
        idn = nn.Conv(self.features, (1, 1), name="downsample")(x)
        y = nn.selu(_bn(_conv(x, self.features, 3, self.conv_type, "conv1")))
        y = _bn(_conv(y, self.features, 3, self.conv_type, "conv2"))
        return nn.selu(y + idn)


class ALIKEDNet(nn.Module):
    """Backbone + score head (aliked.py ALIKED.extract_dense_map:843).

    Returns (feature_map (B, H, W, dim) L2-normalized, score_map (B, H, W)).
    """

    model_name: str = "aliked-n16"

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3)
        c1, c2, c3, c4, dim, _, _ = _ALIKED_CFGS[self.model_name]
        B, H, W, _ = x.shape

        x1 = _ConvBlock(c1, "conv", name="block1")(x)
        x2 = _ResBlock(c2, "conv", name="block2")(
            nn.avg_pool(x1, (2, 2), strides=(2, 2)))
        x3 = _ResBlock(c3, "dcn", name="block3")(
            nn.avg_pool(x2, (4, 4), strides=(4, 4)))
        x4 = _ResBlock(c4, "dcn", name="block4")(
            nn.avg_pool(x3, (4, 4), strides=(4, 4)))

        x1 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv1")(x1))
        x2 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv2")(x2))
        x3 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv3")(x3))
        x4 = nn.selu(nn.Conv(dim // 4, (1, 1), use_bias=False, name="conv4")(x4))

        def up(t):  # torch Upsample(align_corners=True) semantics
            t = jnp.transpose(t, (0, 3, 1, 2))
            t = resize(t, (H, W), "bilinear", align_corners=True)
            return jnp.transpose(t, (0, 2, 3, 1))

        feats = jnp.concatenate([x1, up(x2), up(x3), up(x4)], axis=-1)

        s = nn.selu(nn.Conv(8, (1, 1), use_bias=False, name="score1")(feats))
        s = nn.selu(nn.Conv(4, (3, 3), use_bias=False, name="score2")(s))
        s = nn.selu(nn.Conv(4, (3, 3), use_bias=False, name="score3")(s))
        s = nn.Conv(1, (3, 3), use_bias=False, name="score4")(s)
        score = jax.nn.sigmoid(s[..., 0])

        norm = jnp.sqrt(jnp.sum(feats * feats, -1, keepdims=True) + 1e-12)
        return feats / norm, score


def _eigh2x2(cov: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Closed-form symmetric 2x2 eigendecomposition, ascending eigenvalues.

    cov (..., 2, 2) -> (evals (..., 2), evecs (..., 2, 2) columns).
    """
    a, b, c = cov[..., 0, 0], cov[..., 0, 1], cov[..., 1, 1]
    half_tr = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.square(0.5 * (a - c)) + jnp.square(b) + 1e-24)
    l1, l2 = half_tr - disc, half_tr + disc
    # eigenvector for l2: pick the better-conditioned formula per element
    v2a = jnp.stack([b, l2 - a], -1)
    v2b = jnp.stack([l2 - c, b], -1)
    v2 = jnp.where((jnp.abs(l2 - a) > jnp.abs(l2 - c))[..., None], v2a, v2b)
    n = jnp.sqrt(jnp.sum(v2 * v2, -1, keepdims=True))
    v2 = jnp.where(n > 1e-12, v2 / jnp.maximum(n, 1e-12),
                   jnp.stack([jnp.ones_like(a), jnp.zeros_like(a)], -1))
    v1 = jnp.stack([-v2[..., 1], v2[..., 0]], -1)
    evecs = jnp.stack([v1, v2], -1)  # columns
    return jnp.stack([l1, l2], -1), evecs


def dkd_detect(
    score_map: jax.Array,
    num_keypoints: int = 2048,
    radius: int = 2,
    scores_th: float = 0.2,
    temperature: float = 0.1,
    subpixel: bool = True,
    return_affine: bool = False,
):
    """Differentiable keypoint detection (aliked.py DKD:198), fixed-K.

    score_map (B, H, W) -> (kps_norm (B, N, 2) in [-1, 1], scores (B, N),
    dispersity (B, N), valid (B, N)[, affine (B, N, 2, 2)]).
    """
    score_map = as_float(score_map)
    B, H, W = score_map.shape
    k = 2 * radius + 1
    K2 = k * k

    nms = nms2d(score_map[:, None], (k, k))[:, 0]
    border = jnp.zeros_like(nms)
    nms = border.at[:, radius:H - radius, radius:W - radius].set(
        nms[:, radius:H - radius, radius:W - radius])

    N = min(num_keypoints, H * W)
    nms_vals, idx = jax.lax.top_k(nms.reshape(B, -1), N)
    if scores_th > 0:
        valid = nms_vals > scores_th
        # fall back to per-image mean threshold when nothing clears it
        mean_th = jnp.mean(score_map.reshape(B, -1), -1, keepdims=True)
        valid = jnp.where(jnp.any(valid, -1, keepdims=True), valid,
                          nms_vals > mean_th)
    else:
        valid = nms_vals > 0
    ys = (idx // W).astype(score_map.dtype)
    xs = (idx % W).astype(score_map.dtype)
    wh = jnp.asarray([W - 1, H - 1], score_map.dtype)

    if not subpixel:
        kps = jnp.stack([xs, ys], -1) / wh * 2 - 1
        sc = grid_sample(score_map[:, None], kps[:, :, None, :],
                         mode="bilinear", align_corners=True)[:, 0, :, 0]
        out = (kps, sc, jnp.zeros_like(sc), valid)
        if return_affine:
            eye = jnp.broadcast_to(jnp.eye(2, dtype=score_map.dtype),
                                   (B, N, 2, 2))
            out = out + (eye,)
        return out

    # unfold: 25 zero-padded shifts, row-major over (dy, dx); element n of a
    # patch sees offset (dy, dx) and hw_grid[n] = (dx, dy) in (x, y) form
    pad = jnp.pad(score_map, ((0, 0), (radius, radius), (radius, radius)))
    shifts = [pad[:, dy:dy + H, dx:dx + W]
              for dy in range(k) for dx in range(k)]
    patches = jnp.stack(shifts, -1).reshape(B, H * W, K2)
    patch = jnp.take_along_axis(patches, idx[:, :, None], axis=1)  # (B,N,K2)

    grid1d = jnp.arange(k, dtype=score_map.dtype) - radius
    gx = jnp.tile(grid1d, k)
    gy = jnp.repeat(grid1d, k)
    hw_grid = jnp.stack([gx, gy], -1)  # (K2, 2) as (x, y)

    x_exp = jnp.exp((patch - jnp.max(patch, -1, keepdims=True)) / temperature)
    x_sum = jnp.sum(x_exp, -1, keepdims=True)
    wgt = x_exp / x_sum
    residual = wgt @ hw_grid  # (B, N, 2)

    d2 = jnp.sum(jnp.square((hw_grid[None, None] - residual[:, :, None])
                            / radius), -1)
    dispersity = jnp.sum(x_exp * d2, -1) / x_sum[..., 0]

    kps = (jnp.stack([xs, ys], -1) + residual) / wh * 2 - 1
    sc = grid_sample(score_map[:, None], kps[:, :, None, :],
                     mode="bilinear", align_corners=True)[:, 0, :, 0]
    out = (kps, sc, dispersity, valid)
    if return_affine:
        delta = hw_grid[None, None] - residual[:, :, None]     # (B, N, K2, 2)
        cov = jnp.einsum("bnk,bnki,bnkj->bnij", wgt, delta, delta)
        evals, evecs = _eigh2x2(cov)
        scales = jnp.sqrt(jnp.clip(evals, 1e-8))
        out = out + (evecs * scales[..., None, :],)
    return out


class SDDH(nn.Module):
    """Sparse deformable descriptor head (aliked.py SDDH:618), batched
    fixed-K: one patch row-gather + dense einsums + one grid_sample."""

    dims: int
    kernel_size: int = 3
    n_pos: int = 8

    @nn.compact
    def __call__(self, x, kps_norm):
        # x (B, H, W, C); kps_norm (B, N, 2) in [-1, 1]
        B, H, W, C = x.shape
        N = kps_norm.shape[1]
        ps, P = self.kernel_size, self.n_pos
        chn = 2 * P
        wh = jnp.asarray([W - 1, H - 1], x.dtype)
        kpts_wh = (kps_norm / 2 + 0.5) * wh  # (B, N, 2) xy pixels
        max_off = max(H, W) / 4.0

        w1 = self.param("offset_w1", nn.initializers.lecun_normal(),
                        (ps, ps, C, chn))
        b1 = self.param("offset_b1", nn.initializers.zeros, (chn,))
        w2 = self.param("offset_w2", nn.initializers.lecun_normal(),
                        (chn, chn))
        b2 = self.param("offset_b2", nn.initializers.zeros, (chn,))
        wsf = self.param("sf_w", nn.initializers.lecun_normal(), (C, C))
        agg = self.param("agg_weights", nn.initializers.lecun_normal(),
                         (P, C, C))

        # ps x ps patch row-gather around each keypoint (get_patches:129;
        # the reference truncates the keypoint to int FIRST — aliked.py:690
        # passes kptsi_wh.long() — then shifts by trunc(1 - ps/2))
        corner = kpts_wh.astype(jnp.int32) - ps // 2
        cx = jnp.clip(corner[..., 0], 0, max(W - 1 - ps, 0))
        cy = jnp.clip(corner[..., 1], 0, max(H - 1 - ps, 0))
        dy = jnp.arange(ps)[:, None]
        dx = jnp.arange(ps)[None, :]
        flat = ((cy[:, :, None, None] + dy) * W
                + (cx[:, :, None, None] + dx)).reshape(B, N * ps * ps)
        rows = jnp.take_along_axis(x.reshape(B, H * W, C),
                                   flat[:, :, None], axis=1)
        patch = rows.reshape(B, N, ps, ps, C)

        off = jnp.einsum("bnijc,ijcd->bnd", patch, w1,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        off = nn.selu(off + b1)
        off = off @ w2 + b2
        off = jnp.clip(off, -max_off, max_off)
        # channel layout (2, P): first P channels dx, next P dy (SDDH:702)
        off = off.reshape(B, N, 2, P).transpose(0, 1, 3, 2)  # (B, N, P, 2)

        pos = kpts_wh[:, :, None, :] + off
        pos = 2.0 * pos / wh - 1
        feats = grid_sample(jnp.transpose(x, (0, 3, 1, 2)),
                            pos.reshape(B, N * P, 1, 2),
                            mode="bilinear", align_corners=True)
        feats = feats[:, :, :, 0].transpose(0, 2, 1).reshape(B, N, P, C)

        feats = nn.selu(feats @ wsf)  # 1x1 sf_conv
        desc = jnp.einsum("bnpc,pcd->bnd", feats, agg,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        norm = jnp.sqrt(jnp.sum(desc * desc, -1, keepdims=True) + 1e-12)
        return desc / norm, off


class _ALIKEDModel(nn.Module):
    model_name: str = "aliked-n16"

    def setup(self):
        cfg = _ALIKED_CFGS[self.model_name]
        self.net = ALIKEDNet(self.model_name)
        self.desc_head = SDDH(dims=cfg[4], kernel_size=cfg[5], n_pos=cfg[6])

    def __call__(self, x, num_keypoints, scores_th, nms_radius,
                 return_affine=False):
        fmap, smap = self.net(x)
        det = dkd_detect(smap, num_keypoints, radius=nms_radius,
                         scores_th=scores_th, return_affine=return_affine)
        kps, sc, _disp, valid = det[:4]
        desc, _off = self.desc_head(fmap, kps)
        if return_affine:
            return kps, sc, valid, desc, det[4]
        return kps, sc, valid, desc


def load_torch_weights(state_dict, model_name: str = "aliked-n16") -> dict:
    """Reference ALIKED checkpoint (aliked.py:742 _CHECKPOINT_URL layout)
    -> flax variables for `_ALIKEDModel` / the `ALIKED` wrapper.

    Torch modules map as: blockN.{conv1,bn1,conv2,bn2}(+downsample),
    dcn convs as {offset_conv,regular_conv}, convN/score_head 1x1-3x3
    chain, desc_head.{offset_conv.0/.2,sf_conv,agg_weights}
    (aliked.py:520-836).
    """
    import numpy as np

    def a(k):
        v = state_dict[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    def hwio(k):
        return a(k).transpose(2, 3, 1, 0)

    def conv_block(pre, dcn=False, downsample=False):
        p, s = {}, {}
        for i, cname in ((1, "conv1"), (2, "conv2")):
            if dcn:
                p[cname] = {
                    "offset_conv": {
                        "kernel": hwio(f"{pre}.{cname}.offset_conv.weight"),
                        "bias": a(f"{pre}.{cname}.offset_conv.bias")},
                    "kernel": a(f"{pre}.{cname}.regular_conv.weight"),
                }
            else:
                p[cname] = {"kernel": hwio(f"{pre}.{cname}.weight")}
            bname = f"BatchNorm_{i - 1}"
            p[bname] = {"scale": a(f"{pre}.bn{i}.weight"),
                        "bias": a(f"{pre}.bn{i}.bias")}
            s[bname] = {"mean": a(f"{pre}.bn{i}.running_mean"),
                        "var": a(f"{pre}.bn{i}.running_var")}
        if downsample:
            p["downsample"] = {"kernel": hwio(f"{pre}.downsample.weight"),
                               "bias": a(f"{pre}.downsample.bias")}
        return p, s

    net_p, net_s = {}, {}
    net_p["block1"], net_s["block1"] = conv_block("block1")
    net_p["block2"], net_s["block2"] = conv_block("block2", downsample=True)
    net_p["block3"], net_s["block3"] = conv_block("block3", dcn=True,
                                                  downsample=True)
    net_p["block4"], net_s["block4"] = conv_block("block4", dcn=True,
                                                  downsample=True)
    for i in range(1, 5):
        net_p[f"conv{i}"] = {"kernel": hwio(f"conv{i}.weight")}
    for i, idx in enumerate((0, 2, 4, 6)):
        net_p[f"score{i + 1}"] = {"kernel": hwio(f"score_head.{idx}.weight")}

    w2 = a("desc_head.offset_conv.2.weight")
    desc_p = {
        "offset_w1": hwio("desc_head.offset_conv.0.weight"),
        "offset_b1": a("desc_head.offset_conv.0.bias"),
        "offset_w2": w2[:, :, 0, 0].T,
        "offset_b2": a("desc_head.offset_conv.2.bias"),
        "sf_w": a("desc_head.sf_conv.weight")[:, :, 0, 0].T,
        "agg_weights": a("desc_head.agg_weights"),
    }
    return {"params": {"net": net_p, "desc_head": desc_p},
            "batch_stats": {"net": net_s}}


class ALIKED:
    """ALIKED local features (aliked.py ALIKED:745), fixed-K padded.

    Call with (B, C, H, W) float images in [0, 1] (1 or 3 channels; H, W
    multiples of 32). Returns (kps_px (B, N, 2) xy, scores (B, N),
    descs (B, N, D), valid (B, N)). `forward_laf` returns kornia-style
    (lafs (B, N, 2, 3), responses (B, N, 1), descs (B, N, D)) with LAF
    shape from the soft-argmax covariance (closed-form 2x2 eigh).
    """

    def __init__(self, model_name: str = "aliked-n16",
                 num_keypoints: int = 2048,
                 detection_threshold: float = 0.2, nms_radius: int = 2,
                 params: Optional[dict] = None,
                 key: Optional[jax.Array] = None):
        check(model_name in _ALIKED_CFGS,
              f"unknown ALIKED config {model_name!r}")
        self.model = _ALIKEDModel(model_name)
        self.num_keypoints = num_keypoints
        self.detection_threshold = detection_threshold
        self.nms_radius = nms_radius
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def _prep(self, images: jax.Array) -> jax.Array:
        B, C, H, W = images.shape
        check(C in (1, 3), f"ALIKED expects 1- or 3-channel input, got {C}")
        check(H % 32 == 0 and W % 32 == 0,
              f"ALIKED needs H, W divisible by 32, got {H}x{W}")
        x = as_float(images)
        if C == 1:
            x = jnp.broadcast_to(x, (B, 3, H, W))
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.params is None:
            self.params = self.model.init(
                self._key, jnp.zeros((1, 64, 64, 3)), 16,
                self.detection_threshold, self.nms_radius)
        return x

    def __call__(self, images: jax.Array, n: Optional[int] = None):
        x = self._prep(images)
        H, W = x.shape[1:3]
        kps, sc, valid, desc = self.model.apply(
            self.params, x, n or self.num_keypoints,
            self.detection_threshold, self.nms_radius)
        wh = jnp.asarray([W - 1, H - 1], x.dtype)
        kps_px = (kps + 1) / 2 * wh
        return kps_px, sc, desc, valid

    def forward_laf(self, images: jax.Array, n: Optional[int] = None):
        x = self._prep(images)
        H, W = x.shape[1:3]
        kps, sc, valid, desc, aff = self.model.apply(
            self.params, x, n or self.num_keypoints,
            self.detection_threshold, self.nms_radius, return_affine=True)
        wh = jnp.asarray([W - 1, H - 1], x.dtype)
        kps_px = (kps + 1) / 2 * wh
        m = valid[..., None].astype(x.dtype)
        lafs = jnp.concatenate(
            [aff * m[..., None], (kps_px * m)[..., None]], -1)
        return lafs, (sc * valid)[..., None], desc * m
