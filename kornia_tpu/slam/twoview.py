"""Two-view geometry front end — the minimum end-to-end SLAM slice
(SURVEY.md §7 step 6): detect → describe → match → robust model → pose.

No reference counterpart as a single function; composes the analogues of
kornia's LocalFeatureMatcher (feature/integrated.py:361) + RANSAC
(geometry/ransac.py:42) + motion_from_essential (epipolar/essential.py:609).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..feature.integrated import LocalFeatureMatcher, SIFTFeature
from ..feature.matching import DescriptorMatcher
from ..geometry.conversions import normalize_points_with_intrinsics
from ..geometry.epipolar import motion_from_essential_choose_solution
from ..geometry.ransac import ransac

__all__ = ["TwoViewResult", "match_pair", "two_view_pose"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TwoViewResult:
    R: jax.Array  # (3, 3) relative rotation
    t: jax.Array  # (3, 1) relative translation (unit scale)
    E: jax.Array  # (3, 3) essential matrix
    inliers: jax.Array  # (N,) bool over matches
    keypoints0: jax.Array  # (N, 2)
    keypoints1: jax.Array  # (N, 2)
    num_inliers: jax.Array

    def tree_flatten(self):
        return (self.R, self.t, self.E, self.inliers, self.keypoints0,
                self.keypoints1, self.num_inliers), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def match_pair(img0: jax.Array, img1: jax.Array,
               num_features: int = 512,
               matcher_th: float = 0.95,
               feature: Optional[object] = None) -> Dict[str, jax.Array]:
    """Detect + describe + match one image pair (B=1)."""
    feat = feature or SIFTFeature(num_features=num_features)
    matcher = LocalFeatureMatcher(feat, DescriptorMatcher("smnn", matcher_th))
    return matcher({"image0": img0, "image1": img1})


# whole-pipeline jit cache: (shape, num_features, ransac cfg) → compiled fn.
# One compiled executable per configuration removes the per-op dispatch
# latency that dominates wall time through the remote-TPU tunnel.
_TV_CACHE = {}


def _two_view_fn(shape, num_features, ransac_batch, ransac_iters,
                 matcher_th):
    cache_key = (shape, num_features, ransac_batch, ransac_iters, matcher_th)
    if cache_key in _TV_CACHE:
        return _TV_CACHE[cache_key]
    feat = SIFTFeature(num_features=num_features)
    matcher = LocalFeatureMatcher(feat, DescriptorMatcher("smnn", matcher_th))

    @jax.jit
    def fn(img0, img1, K, rkey, inl_th):
        out = matcher({"image0": img0, "image1": img1})
        kp0 = out["keypoints0"][0]
        kp1 = out["keypoints1"][0]
        valid = out["valid"][0]
        x0 = normalize_points_with_intrinsics(kp0, K)
        x1 = normalize_points_with_intrinsics(kp1, K)
        res = ransac(x0, x1, rkey, "essential", inl_th=inl_th,
                     batch_size=ransac_batch, max_iterations=ransac_iters,
                     mask=valid)
        R, t, _ = motion_from_essential_choose_solution(
            res.model[None], jnp.eye(3)[None], jnp.eye(3)[None],
            x0[None], x1[None], mask=res.inliers[None])
        return TwoViewResult(
            R=R[0], t=t[0], E=res.model, inliers=res.inliers,
            keypoints0=kp0, keypoints1=kp1, num_inliers=res.inlier_count)

    _TV_CACHE[cache_key] = fn
    return fn


def two_view_pose(
    img0: jax.Array,
    img1: jax.Array,
    K: jax.Array,
    key: Optional[jax.Array] = None,
    num_features: int = 512,
    ransac_batch: int = 256,
    ransac_iters: int = 32,
    inl_th_px: float = 1.5,
    feature: Optional[object] = None,
) -> TwoViewResult:
    """Full relative-pose estimation between two calibrated views —
    compiled end-to-end (detect → describe → match → RANSAC → pose)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if feature is not None:
        # custom feature: un-jitted compositional path
        out = match_pair(img0, img1, num_features, feature=feature)
        kp0 = out["keypoints0"][0]
        kp1 = out["keypoints1"][0]
        valid = out["valid"][0]
        x0 = normalize_points_with_intrinsics(kp0, K)
        x1 = normalize_points_with_intrinsics(kp1, K)
        f = 0.5 * (K[0, 0] + K[1, 1])
        res = ransac(x0, x1, key, "essential", inl_th=inl_th_px / f,
                     batch_size=ransac_batch, max_iterations=ransac_iters,
                     mask=valid)
        R, t, _ = motion_from_essential_choose_solution(
            res.model[None], jnp.eye(3)[None], jnp.eye(3)[None],
            x0[None], x1[None], mask=res.inliers[None])
        return TwoViewResult(R=R[0], t=t[0], E=res.model, inliers=res.inliers,
                             keypoints0=kp0, keypoints1=kp1,
                             num_inliers=res.inlier_count)
    fn = _two_view_fn(tuple(img0.shape), num_features, ransac_batch,
                      ransac_iters, 0.95)
    f = 0.5 * (K[0, 0] + K[1, 1])
    return fn(img0, img1, K, key, inl_th_px / f)
