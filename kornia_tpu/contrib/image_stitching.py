"""Image stitching (reference: kornia/contrib/image_stitching.py:30-193):
feature matching + RANSAC homography + warp-and-blend.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..feature.integrated import GFTTSIFTFeature, LocalFeatureMatcher
from ..feature.matching import DescriptorMatcher
from ..geometry.ransac import ransac
from ..ops.warp import warp_perspective

__all__ = ["ImageStitcher"]


class ImageStitcher:
    """Two-image stitcher (reference: ImageStitcher.forward:193)."""

    def __init__(self, matcher=None, estimator: str = "ransac",
                 blending_method: str = "naive", num_features: int = 512):
        self.matcher = matcher or LocalFeatureMatcher(
            GFTTSIFTFeature(num_features=num_features),
            DescriptorMatcher("smnn", 0.95))
        self.blending_method = blending_method

    def estimate_homography(self, img_left: jax.Array, img_right: jax.Array,
                            key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(0)
        out = self.matcher({"image0": img_right, "image1": img_left})
        kp0 = out["keypoints0"][0]
        kp1 = out["keypoints1"][0]
        valid = out["valid"][0]
        res = ransac(kp0, kp1, key, "homography", inl_th=3.0,
                     batch_size=512, max_iterations=8, mask=valid)
        return res.model[None]

    def blend_image(self, src: jax.Array, dst: jax.Array,
                    mask_src: jax.Array) -> jax.Array:
        if self.blending_method == "naive":
            return jnp.where(mask_src > 0.5, src, dst)
        # feathered blend
        w = mask_src
        return src * w + dst * (1.0 - w)

    def __call__(self, img_left: jax.Array, img_right: jax.Array,
                 key: Optional[jax.Array] = None) -> jax.Array:
        """Stitch right onto left's frame; output is 2x wider."""
        img_left = as_float(img_left)
        img_right = as_float(img_right)
        H_img, W_img = img_left.shape[-2:]
        out_w = 2 * W_img
        H = self.estimate_homography(img_left, img_right, key)
        warped = warp_perspective(img_right, H, (H_img, out_w))
        warped_mask = warp_perspective(
            jnp.ones_like(img_right[:, :1]), H, (H_img, out_w))
        base = jnp.pad(img_left, [(0, 0), (0, 0), (0, 0), (0, out_w - W_img)])
        base_mask = jnp.pad(jnp.ones_like(img_left[:, :1]),
                            [(0, 0), (0, 0), (0, 0), (0, out_w - W_img)])
        out = jnp.where(base_mask > 0.5, base,
                        self.blend_image(warped, base, warped_mask))
        return out
