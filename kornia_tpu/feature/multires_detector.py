"""Multi-resolution (KeyNet-style) detector
(reference: kornia/feature/scale_space_detector.py:416
MultiResolutionDetector, kornia/feature/keynet.py:192 KeyNetDetector).

TPU formulation: the image-pyramid level shapes and per-level keypoint
budgets are all static (derived from the input shape at trace time), so
the whole detector jits to one executable — per-level response → border
mask → NMS → fixed-K lax.top_k, then one global top-`num_features` with
validity masks instead of the reference's data-dependent filtering.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..geometry.subpix import nms2d
from .laf import laf_from_center_scale_ori

__all__ = ["MultiResolutionDetector", "KeyNetDetector",
           "default_detector_config"]

# reference: scale_space_detector.py:606 _DEFAULT_DETECTOR_CONFIG
default_detector_config: Dict = {
    "nms_size": 15,
    "pyramid_levels": 4,
    "up_levels": 1,
    "scale_factor_levels": math.sqrt(2.0),
    "s_mult": 22.0,
}


class MultiResolutionDetector:
    """Any-response multi-scale detector; (B, 1, H, W) →
    (lafs (B, K, 2, 3), responses (B, K), valid (B, K))."""

    def __init__(self, model: Callable[[jax.Array], jax.Array],
                 num_features: int = 2048,
                 config: Optional[Dict] = None,
                 ori_module=None, aff_module=None,
                 score_threshold: float = 0.0):
        config = config or default_detector_config
        self.model = model
        self.num_features = num_features
        self.num_pyramid_levels = config["pyramid_levels"]
        self.num_upscale_levels = config["up_levels"]
        self.scale_factor_levels = config["scale_factor_levels"]
        self.mr_size = config["s_mult"]
        self.nms_size = config["nms_size"]
        self.score_threshold = score_threshold
        self.ori = ori_module
        self.aff = aff_module

    def _points_per_level(self):
        """reference: scale_space_detector.py:528-536 (float budget split
        proportional to level area, then int truncation)."""
        factor_points = self.scale_factor_levels**2
        levels = self.num_pyramid_levels + self.num_upscale_levels + 1
        tmp = 0.0
        nfl = []
        for i in range(levels):
            tmp += factor_points ** (-1 * (i - self.num_upscale_levels))
            nfl.append(self.num_features
                       * factor_points ** (-1 * (i - self.num_upscale_levels)))
        return [int(x / tmp) for x in nfl]

    def _level_topk(self, level_img: jax.Array, num_kp: int,
                    factor: Tuple[float, float], borders: int = 15):
        """One pyramid level: response → border zeroing → NMS → top-k →
        LAFs in original-image coordinates
        (reference: scale_space_detector.py:481-516)."""
        B, _, H, W = level_img.shape
        resp = self.model(level_img)
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        inside = ((ys[:, None] >= borders) & (ys[:, None] < H - borders)
                  & (xs[None, :] >= borders) & (xs[None, :] < W - borders))
        # borders are zeroed BEFORE NMS (reference: nms(remove_borders(...)))
        # — a strong border pixel must not suppress its inside neighbours
        resp = resp * inside[None, None].astype(resp.dtype)
        det = nms2d(resp, (self.nms_size, self.nms_size))
        flat = det.reshape(B, H * W)
        neg_fill = jnp.finfo(flat.dtype).min / 2
        masked = jnp.where(flat <= self.score_threshold, neg_fill, flat)
        k = min(num_kp, H * W)
        scores, idx = jax.lax.top_k(masked, k)
        valid = scores > self.score_threshold
        y = (idx // W).astype(flat.dtype)
        x = (idx % W).astype(flat.dtype)
        fx, fy = factor
        xy = jnp.stack([x * fx, y * fy], axis=-1)  # (B, k, 2)
        scale_val = 0.5 * (fx + fy) * self.mr_size
        scale = jnp.full((B, k, 1, 1), scale_val, flat.dtype)
        lafs = laf_from_center_scale_ori(xy, scale)
        return scores, lafs, valid

    def detect(self, img: jax.Array):
        img = as_float(img)
        B, _, h, w = img.shape
        nfl = self._points_per_level()
        sf = self.scale_factor_levels
        all_scores, all_lafs, all_valid = [], [], []
        # upscale levels (reference: scale_space_detector.py:542-557)
        from ..ops.warp import resize
        img_up = img
        for i in range(self.num_upscale_levels):
            nf = nfl[len(nfl) - self.num_pyramid_levels - 1 - (i + 1)]
            up = sf ** (1 + i)
            nh, nw = int(h * up), int(w * up)
            img_up = resize(img_up, (nh, nw), "bilinear",
                            align_corners=False)
            s, l, v = self._level_topk(img_up, int(nf),
                                       (w / nw, h / nh))
            all_scores.append(s)
            all_lafs.append(l)
            all_valid.append(v)
        # base + downscale pyramid (reference: scale_space_detector.py:559-575)
        from ..ops.pyramid import pyrdown
        cur = img
        for i in range(self.num_pyramid_levels + 1):
            if i > 0:
                cur = pyrdown(cur, factor=sf)
                nh, nw = cur.shape[-2:]
                factor = (w / nw, h / nh)
            else:
                factor = (1.0, 1.0)
            num_points = int(nfl[i])
            if i > 0 or self.num_upscale_levels > 0:
                num_points = sum(nfl[: i + 1 + self.num_upscale_levels])
            s, l, v = self._level_topk(cur, num_points, factor)
            all_scores.append(s)
            all_lafs.append(l)
            all_valid.append(v)
        scores = jnp.concatenate(all_scores, axis=1)
        lafs = jnp.concatenate(all_lafs, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)
        # global fixed-K selection; invalid slots carry huge-negative scores
        neg_fill = jnp.finfo(scores.dtype).min / 2
        k = min(self.num_features, scores.shape[1])
        top, idx = jax.lax.top_k(jnp.where(valid, scores, neg_fill), k)
        # gather the 6 LAF components as flat takes (a (B, N, 2, 3)
        # take_along_axis is a multi-dim-slice gather, ~40x slower on TPU)
        lafs = jnp.stack([
            jnp.stack([jnp.take_along_axis(lafs[:, :, i, j], idx, axis=1)
                       for j in range(3)], axis=-1)
            for i in range(2)], axis=-2)
        valid = jnp.take_along_axis(valid, idx, axis=1)
        return jnp.where(valid, top, 0.0), lafs, valid

    def __call__(self, img: jax.Array
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """→ (lafs, responses, valid)
        (reference: scale_space_detector.py:583 forward)."""
        resp, lafs, valid = self.detect(img)
        if self.aff is not None:
            lafs = self.aff(lafs, img)
        if self.ori is not None:
            lafs = self.ori(lafs, img)
        return lafs, resp, valid


class KeyNetDetector(MultiResolutionDetector):
    """Multi-scale detector with the Key.Net response
    (reference: keynet.py:192)."""

    def __init__(self, params=None, num_features: int = 2048,
                 config: Optional[Dict] = None,
                 ori_module=None, aff_module=None,
                 score_threshold: float = 0.0):
        from .descriptors import KeyNet
        model = KeyNet(params)
        super().__init__(model, num_features, config, ori_module,
                         aff_module, score_threshold)
