"""Sequential monocular visual odometry with scale propagation and
windowed local BA (north-star config 3: "batched detect/match + pose
chaining with windowed local BA"; no reference counterpart — kornia's
closest is the HomographyTracker mini-loop, tracking/planar_tracker.py:30).

Design (all static shapes, two jitted executables total):
  * `detect` runs ONCE per frame (features are cached and reused by the
    next pair — half the detection cost of naive pair-matching).
  * `pair_step` matches cached features, runs E and H RANSAC with
    ORB-SLAM-style model selection, triangulates inliers, and propagates
    the monocular scale through a per-keypoint depth table: the matched
    keypoints of frame i are shared between pairs (i-1, i) and (i, i+1),
    so the ratio of their triangulated depths recovers the relative
    translation scale (masked-median, robust to outliers).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..feature.integrated import GFTTSIFTFeature, LocalFeatureMatcher, SIFTFeature
from ..feature.matching import DescriptorMatcher, match_smnn
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


def _masked_median(x: jax.Array, mask: jax.Array, fill: float = 1.0
                   ) -> jax.Array:
    """Median over masked entries; `fill` when the mask is empty."""
    big = jnp.where(mask, x, jnp.inf)
    order = jnp.sort(big)
    cnt = jnp.sum(mask)
    mid = jnp.maximum(cnt - 1, 0) // 2
    med = order[mid]
    return jnp.where(cnt > 0, med, fill)


class VisualOdometry:
    """Monocular VO: detect once per frame → match → E/H RANSAC →
    scale-propagated chaining → optional windowed BA."""

    def __init__(self, K: jax.Array, num_features: int = 512,
                 window: int = 5, ransac_iters: int = 8,
                 ransac_batch: int = 1024, inl_th_px: float = 1.5,
                 ba_iters: int = 6, matcher_th: float = 0.95):
        self.K = K
        self.window = window
        self.ba_iters = ba_iters
        self.ransac_iters = ransac_iters
        self.ransac_batch = ransac_batch
        self.inl_th_px = inl_th_px
        self.matcher_th = matcher_th
        # corners (GFTT) give denser, better-distributed tracks than DoG
        # blobs for frame-to-frame odometry
        self.feature = GFTTSIFTFeature(num_features=num_features)
        self.matcher = LocalFeatureMatcher(
            self.feature, DescriptorMatcher("smnn", matcher_th))
        self._detect_jit = None
        self._pair_jit = None

    # -- jitted stage 1: per-frame features ------------------------------
    def _detect_fn(self):
        if self._detect_jit is not None:
            return self._detect_jit
        feat = self.feature

        @jax.jit
        def fn(img):
            lafs, resps, descs, valid = feat(img)
            kp = lafs[0, :, :2, 2]
            return kp, descs[0], valid[0]

        self._detect_jit = fn
        return fn

    # -- jitted stage 2: pair pose + scale propagation --------------------
    def _pair_fn(self):
        if self._pair_jit is not None:
            return self._pair_jit
        rb, ri, mth = self.ransac_batch, self.ransac_iters, self.matcher_th

        @jax.jit
        def fn(kp0, d0, v0, kp1, d1, v1, K, key, inl_th,
               depth_prev, has_prev):
            dists, idx, mvalid = match_smnn(d0, d1, mth, v0, v1)
            mkp1 = kp1[idx[:, 1]]
            x0 = normalize_points_with_intrinsics(kp0, K)
            x1 = normalize_points_with_intrinsics(mkp1, K)
            k_e, k_h = jax.random.split(key)
            res_e = ransac(x0, x1, k_e, "essential", inl_th=inl_th,
                           batch_size=rb, max_iterations=ri, mask=mvalid)
            res_h = ransac(x0, x1, k_h, "homography", inl_th=inl_th,
                           batch_size=rb, max_iterations=ri, mask=mvalid)
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
            inliers = jnp.where(use_h, res_h.inliers, res_e.inliers) & mvalid
            n_inl = jnp.where(use_h, res_h.inlier_count, res_e.inlier_count)
            t = t[:, 0] / jnp.maximum(jnp.linalg.norm(t[:, 0]), 1e-9)

            # triangulate inliers with unit baseline: depths in frame-0 and
            # frame-1 camera frames
            P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
            P1 = jnp.concatenate([R, t[:, None]], -1)
            X = triangulate_points(P0[None], P1[None], x0[None], x1[None])[0]
            z0 = X[:, 2]
            z1 = (X @ R.T + t)[:, 2]
            good = inliers & (z0 > 1e-3) & (z1 > 1e-3)

            # scale from common tracks: frame-0 keypoint k of this pair is
            # row k of the match table (idx[:, 0] == arange); the previous
            # pair filled depth_prev[k] with its scaled depth
            prev_d = depth_prev
            common = good & (prev_d > 0.0)
            ratio = prev_d / jnp.maximum(z0, 1e-9)
            scale = _masked_median(ratio, common, fill=1.0)
            scale = jnp.where(has_prev & (jnp.sum(common) >= 5), scale, 1.0)
            scale = jnp.clip(scale, 0.05, 20.0)
            t = t * scale

            # depth table for frame 1 (next pair's frame 0), at this
            # pair's scale; scatter by the frame-1 keypoint index (drop
            # duplicate targets — last write wins, harmless for a median)
            z1_scaled = jnp.where(good, z1 * scale, 0.0)
            depth_next = jnp.zeros_like(depth_prev)
            depth_next = depth_next.at[idx[:, 1]].set(z1_scaled)
            return R, t, inliers, n_inl, depth_next

        self._pair_jit = fn
        return fn

    def run(self, frames: List[jax.Array], key: Optional[jax.Array] = None
            ) -> VOResult:
        """frames: list of (1, 1|3, H, W) images. Returns world→cam poses
        with the first frame as identity; the first step's baseline fixes
        the monocular scale, later steps propagate it through shared
        tracks."""
        if key is None:
            key = jax.random.PRNGKey(0)
        detect = self._detect_fn()
        pair = self._pair_fn()
        f = 0.5 * (self.K[0, 0] + self.K[1, 1])
        inl_th = self.inl_th_px / float(f)

        poses = [np.eye(4)]
        inliers = []
        T_w_prev = Se3.identity()
        kp_prev, d_prev, v_prev = detect(frames[0])
        Kf = kp_prev.shape[0]
        depth_prev = jnp.zeros((Kf,), jnp.float32)
        has_prev = jnp.asarray(False)
        for i in range(1, len(frames)):
            key, sub = jax.random.split(key)
            kp_cur, d_cur, v_cur = detect(frames[i])
            R, t, inl, n_inl, depth_prev = pair(
                kp_prev, d_prev, v_prev, kp_cur, d_cur, v_cur,
                self.K, sub, inl_th, depth_prev, has_prev)
            has_prev = jnp.asarray(True)
            T_rel = Se3(So3.from_matrix(R), t)
            T_w_cur = T_rel * T_w_prev
            poses.append(np.asarray(T_w_cur.matrix()))
            inliers.append(int(n_inl))
            T_w_prev = T_w_cur
            kp_prev, d_prev, v_prev = kp_cur, d_cur, v_cur
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
