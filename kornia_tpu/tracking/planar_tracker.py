"""Planar homography tracker
(reference: kornia/tracking/planar_tracker.py:30-216 HomographyTracker):
target-vs-frame matching + RANSAC homography + frame-to-frame chaining —
the mini planar-SLAM loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from ..core.dtype import as_float
from ..feature.integrated import GFTTSIFTFeature, LocalFeatureMatcher
from ..feature.matching import DescriptorMatcher
from ..geometry.homography import oneway_transfer_error
from ..geometry.ransac import ransac

__all__ = ["HomographyTracker"]


class HomographyTracker:
    """Track a planar target through a video (reference: forward:216).

    State: previous homography for chaining; matching happens
    target↔frame, seeded from the previous estimate."""

    def __init__(self, num_features: int = 512, inl_th: float = 3.0,
                 min_inliers: int = 15):
        # GFTT corners: denser and better-distributed than DoG blobs for
        # planar targets
        self.matcher = LocalFeatureMatcher(
            GFTTSIFTFeature(num_features=num_features),
            DescriptorMatcher("smnn", 0.95))
        self.inl_th = inl_th
        self.min_inliers = min_inliers
        self.target: Optional[jax.Array] = None
        self.previous_homography: Optional[jax.Array] = None
        self._frame_idx = 0

    def set_target(self, target: jax.Array) -> None:
        self.target = as_float(target)
        self.previous_homography = None
        self._frame_idx = 0

    def match_and_estimate(self, frame: jax.Array,
                           key: Optional[jax.Array] = None
                           ) -> Tuple[jax.Array, jax.Array]:
        """→ (H (1, 3, 3) target→frame, success flag)."""
        assert self.target is not None, "call set_target first"
        if key is None:
            key = jax.random.fold_in(jax.random.PRNGKey(7), self._frame_idx)
        self._frame_idx += 1
        out = self.matcher({"image0": self.target, "image1": as_float(frame)})
        kp0 = out["keypoints0"][0]
        kp1 = out["keypoints1"][0]
        valid = out["valid"][0]
        # seed from the previous homography: drop matches inconsistent
        # with the prediction (reference's chaining logic)
        if self.previous_homography is not None:
            err = oneway_transfer_error(
                kp0[None], kp1[None], self.previous_homography, False)[0]
            valid = valid & (err < 30.0)
        res = ransac(kp0, kp1, key, "homography", inl_th=self.inl_th,
                     batch_size=512, max_iterations=8, mask=valid)
        success = res.inlier_count >= self.min_inliers
        H = res.model[None]
        if bool(success):
            self.previous_homography = H
        return H, success

    __call__ = match_and_estimate
