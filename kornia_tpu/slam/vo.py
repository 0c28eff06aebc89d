"""Sequential visual odometry with windowed local BA
(north-star config 3: "batched detect/match + pose chaining with windowed
local BA"; no reference counterpart — kornia's closest is the
HomographyTracker mini-loop, tracking/planar_tracker.py:30).

Design: frame-to-frame two-view essential pose + triangulation seeds a
sliding window; each window refinement is one jitted LM-BA call (static
window size W, static K points — padded with validity masks).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..feature.integrated import GFTTSIFTFeature, LocalFeatureMatcher, SIFTFeature
from ..feature.matching import DescriptorMatcher
from ..geometry.conversions import normalize_points_with_intrinsics
from ..geometry.epipolar import (
    motion_from_essential_choose_solution,
    motion_from_homography_choose_solution,
    projection_from_KRt,
    triangulate_points,
)
from ..geometry.liegroup import Se3, So3
from ..geometry.ransac import ransac
from .ba import BAProblem, BAState, bundle_adjust

__all__ = ["VisualOdometry", "VOResult"]


@dataclasses.dataclass
class VOResult:
    poses: List[np.ndarray]  # (4, 4) world→camera per frame
    num_inliers: List[int]


class VisualOdometry:
    """Monocular VO: detect → match → essential RANSAC → scale-propagated
    chaining → windowed BA."""

    def __init__(self, K: jax.Array, num_features: int = 512,
                 window: int = 5, ransac_iters: int = 8,
                 ransac_batch: int = 1024, inl_th_px: float = 1.5,
                 ba_iters: int = 6):
        self.K = K
        self.window = window
        self.ba_iters = ba_iters
        self.ransac_iters = ransac_iters
        self.ransac_batch = ransac_batch
        self.inl_th_px = inl_th_px
        # corners (GFTT) give denser, better-distributed tracks than DoG
        # blobs for frame-to-frame odometry
        self.feature = GFTTSIFTFeature(num_features=num_features)
        self.matcher = LocalFeatureMatcher(
            self.feature, DescriptorMatcher("smnn", 0.95))

    def _pair_fn(self):
        """Whole-pair jitted computation (cached): detect + describe +
        match + E and H RANSAC + decomposition + ORB-SLAM-style model
        selection as a where-select (no host round trips)."""
        if getattr(self, "_compiled_pair", None) is not None:
            return self._compiled_pair
        matcher = self.matcher
        rb, ri = self.ransac_batch, self.ransac_iters

        @jax.jit
        def fn(img0, img1, K, key, inl_th):
            out = matcher({"image0": img0, "image1": img1})
            kp0 = out["keypoints0"][0]
            kp1 = out["keypoints1"][0]
            valid = out["valid"][0]
            x0 = normalize_points_with_intrinsics(kp0, K)
            x1 = normalize_points_with_intrinsics(kp1, K)
            k_e, k_h = jax.random.split(key)
            res_e = ransac(x0, x1, k_e, "essential", inl_th=inl_th,
                           batch_size=rb, max_iterations=ri, mask=valid)
            res_h = ransac(x0, x1, k_h, "homography", inl_th=inl_th,
                           batch_size=rb, max_iterations=ri, mask=valid)
            R_e, t_e, _ = motion_from_essential_choose_solution(
                res_e.model[None], jnp.eye(3)[None], jnp.eye(3)[None],
                x0[None], x1[None], mask=res_e.inliers[None])
            R_h, t_h, _ = motion_from_homography_choose_solution(
                res_h.model[None], x0[None], x1[None],
                mask=res_h.inliers[None])
            # planar/pure-rotation degeneracy: prefer H when it explains
            # nearly as many correspondences as E
            use_h = res_h.inlier_count > 0.85 * jnp.maximum(
                res_e.inlier_count, 1)
            R = jnp.where(use_h, R_h[0], R_e[0])
            t = jnp.where(use_h, t_h[0], t_e[0])
            inliers = jnp.where(use_h, res_h.inliers, res_e.inliers)
            n_inl = jnp.where(use_h, res_h.inlier_count, res_e.inlier_count)
            return R, t, x0, x1, inliers, n_inl

        self._compiled_pair = fn
        return fn

    def _pair(self, img0, img1, key):
        f = 0.5 * (self.K[0, 0] + self.K[1, 1])
        R, t, x0, x1, inliers, n_inl = self._pair_fn()(
            img0, img1, self.K, key, self.inl_th_px / f)
        return R, t, x0, x1, inliers, int(n_inl)

    def run(self, frames: List[jax.Array], key: Optional[jax.Array] = None
            ) -> VOResult:
        """frames: list of (1, 1|3, H, W) images. Returns world→cam poses
        with the first frame as identity; translation scale is fixed by
        normalizing each step's baseline (monocular scale ambiguity)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        poses = [np.eye(4)]
        inliers = []
        T_w_prev = Se3.identity()
        for i in range(1, len(frames)):
            key, sub = jax.random.split(key)
            R, t, x0, x1, inl, n_inl = self._pair(frames[i - 1], frames[i], sub)
            t_dir = t[:, 0] / jnp.maximum(jnp.linalg.norm(t[:, 0]), 1e-9)
            T_rel = Se3(So3.from_matrix(R), t_dir)
            T_w_cur = T_rel * T_w_prev
            M = np.asarray(T_w_cur.matrix())
            poses.append(M)
            inliers.append(n_inl)
            T_w_prev = T_w_cur
        return VOResult(poses=poses, num_inliers=inliers)

    def refine_window(self, frames: List[jax.Array], poses: List[np.ndarray],
                      key: Optional[jax.Array] = None
                      ) -> Tuple[List[np.ndarray], jax.Array]:
        """Windowed BA over the LAST `window` frames: matches each
        consecutive pair, triangulates from current poses, bundles."""
        if key is None:
            key = jax.random.PRNGKey(1)
        W = min(self.window, len(frames))
        frames_w = frames[-W:]
        poses_w = poses[-W:]
        C = len(frames_w)
        cam_idx_list, pt_idx_list, uv_list = [], [], []
        pts3d_list = []
        n_pts = 0
        for i in range(C - 1):
            key, sub = jax.random.split(key)
            out = self.matcher({"image0": frames_w[i],
                                "image1": frames_w[i + 1]})
            kp0 = out["keypoints0"][0]
            kp1 = out["keypoints1"][0]
            valid = np.asarray(out["valid"][0])
            idx = np.where(valid)[0]
            if idx.size == 0:
                continue
            P0 = projection_from_KRt(self.K[None],
                                     jnp.asarray(poses_w[i][None, :3, :3]),
                                     jnp.asarray(poses_w[i][None, :3, 3:4]))
            P1 = projection_from_KRt(self.K[None],
                                     jnp.asarray(poses_w[i + 1][None, :3, :3]),
                                     jnp.asarray(poses_w[i + 1][None, :3, 3:4]))
            X = triangulate_points(P0, P1, kp0[None], kp1[None])[0]
            Xv = np.asarray(X)[idx]
            kp0v = np.asarray(kp0)[idx]
            kp1v = np.asarray(kp1)[idx]
            m = idx.size
            pts3d_list.append(Xv)
            cam_idx_list += [np.full(m, i), np.full(m, i + 1)]
            pt_idx_list += [np.arange(n_pts, n_pts + m)] * 2
            uv_list += [kp0v, kp1v]
            n_pts += m
        if n_pts == 0:
            return poses, jnp.zeros(1)
        cam_idx = jnp.asarray(np.concatenate(cam_idx_list), jnp.int32)
        pt_idx = jnp.asarray(np.concatenate(pt_idx_list), jnp.int32)
        uv = jnp.asarray(np.concatenate(uv_list), jnp.float32)
        X0 = jnp.asarray(np.concatenate(pts3d_list), jnp.float32)
        problem = BAProblem(cam_idx, pt_idx, uv,
                            jnp.ones(cam_idx.shape[0], bool), self.K)
        R_stack = jnp.asarray(np.stack([p[:3, :3] for p in poses_w]))
        t_stack = jnp.asarray(np.stack([p[:3, 3] for p in poses_w]))
        state0 = BAState(Se3(So3.from_matrix(R_stack), t_stack), X0)
        state, costs = bundle_adjust(state0, problem, C, n_pts,
                                     num_iters=self.ba_iters,
                                     robust="cauchy", robust_delta=3.0)
        out_poses = list(poses[:-W])
        M = np.asarray(state.poses.matrix())
        for i in range(C):
            out_poses.append(M[i])
        return out_poses, costs
