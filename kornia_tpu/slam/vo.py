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
  * **Keyframe selection** (round-4): every frame is tracked against the
    LAST KEYFRAME, and a frame is promoted to keyframe only when the
    scale-free parallax (baseline / median triangulated depth of the
    unit-baseline two-view solution) clears `kf_parallax`, matching
    support vs the keyframe decays, or `kf_max_skip` frames have been
    skipped. In-between frames get parallax-independent PnP poses
    against the keyframe map; BA chains and refines KEYFRAMES only —
    fewer, longer-baseline steps mean less compounded scale drift and a
    better-conditioned triangulation (the standard fix for
    small-baseline sequences; see ROADMAP "keyframe selection").
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
from ..geometry.calibration import pnp_ransac
from ..geometry.liegroup import Se3, So3
from ..geometry.ransac import _error as _ransac_error, ransac
from .ba import BAProblem, BAState, bundle_adjust, reprojection_residuals

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
                 window: int = 5, ransac_iters: int = 32,
                 ransac_batch: int = 256, inl_th_px: float = 1.5,
                 ba_iters: int = 12, matcher_th: float = 0.95,
                 global_ba_frames: int = 128,
                 kf_parallax: float = 0.022, kf_max_skip: int = 6,
                 kf_min_matches: int = 48, kf_match_decay: float = 0.45,
                 gnc_deltas: Tuple[float, float, float] = (24.0, 2.0, 1.0),
                 ba_track_budget: int = 4096,
                 incremental_ba: bool = True,
                 ba_map_feedback: bool = False,
                 incremental_fix: int = 2,
                 global_ba_passes: int = 2,
                 incremental_rot_gate: float = 0.2):
        self.K = K
        self.window = window
        self.ba_iters = ba_iters
        self.global_ba_frames = global_ba_frames
        self.ransac_iters = ransac_iters
        self.ransac_batch = ransac_batch
        self.inl_th_px = inl_th_px
        self.matcher_th = matcher_th
        self.pnp_min_inliers = 20
        # keyframe promotion: parallax gate (baseline / median depth —
        # scale-free), with forced promotion on match decay or max skip
        self.kf_parallax = kf_parallax
        self.kf_max_skip = kf_max_skip
        self.kf_min_matches = kf_min_matches
        self.kf_match_decay = kf_match_decay
        # GNC annealing schedule (pixel-scale multiples of s_px): wide
        # huber pull-in, cauchy, tight re-gated huber polish
        self.gnc_deltas = gnc_deltas
        # static track-table cap for the window/global BA: when the real
        # track count exceeds it, _build_window_tracks keeps the LONGEST
        # tracks — at full global-BA scale (~100 keyframes x 512 kp) the
        # cap binds hard and the longest-first bias selects low-parallax
        # long-lived features, which under-constrains scale (round-5
        # full-scale circuit: global BA degraded a 4.8% chain to 14.5%)
        self.ba_track_budget = ba_track_budget
        # diagnostics/ablation switches (round-5): run the per-keyframe
        # local BA during tracking, and feed its refined map into PnP
        self.incremental_ba = incremental_ba
        self.ba_map_feedback = ba_map_feedback
        # deeper fixed prefix for the incremental windows approximates
        # ORB-SLAM's covisibility-anchored local BA (fixed outer keyframes
        # constrain the bas-relief direction a free fixating window has)
        self.incremental_fix = incremental_fix
        self.global_ba_passes = global_ba_passes
        # incremental pose writes are gated on the window's ROTATION SPAN
        # (geodesic angle first→last chained keyframe): a short-track
        # window sweeping a large rotation is bas-relief ill-conditioned
        # and its BA optimum is displaced — writing such poses mid-run
        # destroyed the 100-frame circuit (refined 5.3% -> 11-12%) while
        # the same writes were the walk's main gain (2.31% -> 1.44%) and
        # benign on the orbit. 0.2 rad: measured window spans are ~0.11
        # (walk) / ~0.14 (orbit) vs >=0.3 rad on the rotating circuit
        # even in its slowest-yaw quarter (a 0.35 first guess leaked
        # writes there and re-broke the circuit).
        self.incremental_rot_gate = incremental_rot_gate
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

    # -- jitted stage 2: pair pose + map update --------------------------
    def _pair_fn(self):
        if self._pair_jit is not None:
            return self._pair_jit
        rb, ri, mth = self.ransac_batch, self.ransac_iters, self.matcher_th
        pnp_min = self.pnp_min_inliers

        @jax.jit
        def fn(kp0, d0, v0, kp1, d1, v1, K, key, inl_th,
               depth_prev, has_prev, R0, t0):
            """One tracking step (frame i-1 → i), absolute poses.

            depth_prev: (K,) per-keypoint map depth in frame i-1's camera,
            WORLD scale (0 = no map point). R0/t0: world→cam(i-1).
            Tracking is PnP RANSAC against the back-projected map
            (ORB-SLAM's 3D-2D tracking); the E/H two-view branch seeds the
            first pair and re-bootstraps after tracking loss — a 3D-2D
            solve is immune to the two-view rotation/translation
            ambiguity of near-forward motion.
            """
            dists, idx, mvalid = match_smnn(d0, d1, mth, v0, v1)
            mkp1 = kp1[idx[:, 1]]
            x0 = normalize_points_with_intrinsics(kp0, K)
            x1 = normalize_points_with_intrinsics(mkp1, K)
            k_e, k_h, k_p = jax.random.split(key, 3)

            # --- branch A: two-view E/H (bootstrap + fallback) ----------
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
            R2v = jnp.where(use_h, R_h[0], R_e[0])
            t2v = jnp.where(use_h, t_h[0], t_e[0])
            inl_2v = jnp.where(use_h, res_h.inliers, res_e.inliers) & mvalid
            n_2v = jnp.where(use_h, res_h.inlier_count, res_e.inlier_count)
            t2v = t2v[:, 0] / jnp.maximum(jnp.linalg.norm(t2v[:, 0]), 1e-9)

            # two-view translation scale from map-depth ratios
            P0u = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
            P1u = jnp.concatenate([R2v, t2v[:, None]], -1)
            Xu = triangulate_points(P0u[None], P1u[None],
                                    x0[None], x1[None])[0]
            zu0 = Xu[:, 2]
            zu1 = (Xu @ R2v.T + t2v)[:, 2]
            good_u = inl_2v & (zu0 > 1e-3) & (zu1 > 1e-3)
            common = good_u & (depth_prev > 0.0)
            ratio = depth_prev / jnp.maximum(zu0, 1e-9)
            scale = _masked_median(ratio, common, fill=1.0)
            scale = jnp.where(has_prev & (jnp.sum(common) >= 5), scale, 1.0)
            scale = jnp.clip(scale, 0.05, 20.0)
            R1_2v = R2v @ R0
            t1_2v = R2v @ t0 + scale * t2v

            # --- branch B: PnP against the map (primary tracking) -------
            x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], -1)
            Xc0 = depth_prev[:, None] * x0h  # (K, 3) cam(i-1) frame
            Xw = (Xc0 - t0) @ R0  # R0^T (Xc0 - t0)
            map_ok = mvalid & (depth_prev > 0.0)
            R1_p, t1_p, inl_p, n_p = pnp_ransac(
                Xw, x1, k_p, 2.0 * inl_th, mask=map_ok,
                batch_size=rb // 2, gn_iters=5)

            # PnP wins only with BOTH absolute support and a healthy
            # inlier ratio — a sparse/noisy map must not override a
            # well-conditioned two-view estimate (e.g. sideways orbits)
            n_map = jnp.sum(map_ok)
            use_pnp = has_prev & (n_p >= pnp_min) & \
                (n_p >= 0.6 * jnp.maximum(n_map, 1))
            # NOTE round-4: a motion-only huber polish of the selected
            # pose against the map (ORB-SLAM pose-optimization style) was
            # tried here and REMOVED — the single-pair-triangulated map
            # is biased enough that fitting the pose to it degraded the
            # strong-baseline sequences (walk7 0.8% -> 5.3%). PnP RANSAC's
            # internal GN (now actually converging after the exp-map
            # jacobian fix, geometry/calibration.py:_exp_so3_cal) already
            # polishes on its re-gated inlier set.
            R1 = jnp.where(use_pnp, R1_p, R1_2v)
            t1 = jnp.where(use_pnp, t1_p, t1_2v)
            inliers = jnp.where(use_pnp, inl_p, inl_2v)
            n_inl = jnp.where(use_pnp, n_p, n_2v)

            # --- map update: triangulate matches at WORLD scale ---------
            R_rel = R1 @ R0.T
            t_rel = t1 - R_rel @ t0
            P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
            P1 = jnp.concatenate([R_rel, t_rel[:, None]], -1)
            X = triangulate_points(P0[None], P1[None], x0[None], x1[None])[0]
            z0 = X[:, 2]
            z1 = (X @ R_rel.T + t_rel)[:, 2]

            # BA track gate: a LOOSE (5x) residual bound under EITHER final
            # two-view model. The tight inlier set of a wrong-but-high-
            # scoring model contains exactly the points that reproduce it;
            # raw mutual-SNN matches carry ~40% gross outliers. The loose
            # either-model band keeps true-geometry matches while dropping
            # gross mismatches.
            e_e = _ransac_error("essential", x0, x1, res_e.model[None])[0]
            e_h = _ransac_error("homography", x0, x1, res_h.model[None])[0]
            loose = 25.0 * inl_th * inl_th
            track_mask = mvalid & ((e_e < loose) | (e_h < loose))

            good = track_mask & (z0 > 1e-3) & (z1 > 1e-3) \
                & (jnp.linalg.norm(t_rel) > 1e-6)
            # map densification (VERDICT r3 item 1): a matched keypoint
            # whose fresh triangulation fails the gate (low parallax,
            # cheirality) but which carries a map depth keeps it — the
            # depth is PROPAGATED through the relative motion instead of
            # dropped. Denser per-frame maps raise both PnP tracking
            # support and loop-closure verification margins.
            z_prop = (Xc0 @ R_rel.T + t_rel)[:, 2]
            prop_ok = track_mask & (depth_prev > 0.0) & (z_prop > 1e-3)
            val = jnp.where(good, z1, jnp.where(prop_ok, z_prop, 0.0))
            # .max scatter: duplicate/invalid indices write 0 and can
            # never clobber a real depth
            depth_next = jnp.zeros_like(depth_prev).at[idx[:, 1]].max(val)
            # scale-free parallax of this pair: the unit-baseline
            # triangulation has baseline 1, so baseline/median-depth is
            # 1/median(z). Drives keyframe promotion host-side.
            zmed_u = _masked_median(zu0, good_u, fill=1e6)
            parallax = 1.0 / jnp.maximum(zmed_u, 1e-6)
            diag = jnp.stack([jnp.sum(map_ok).astype(jnp.float32),
                              n_p.astype(jnp.float32),
                              use_pnp.astype(jnp.float32),
                              n_2v.astype(jnp.float32), scale,
                              parallax,
                              jnp.sum(mvalid).astype(jnp.float32)])
            return R1, t1, inliers, n_inl, depth_next, idx, track_mask, diag

        self._pair_jit = fn
        return fn

    def run(self, frames: List[jax.Array], key: Optional[jax.Array] = None,
            refine: bool = True, verbose: bool = False) -> VOResult:
        """frames: list of (1, 1|3, H, W) images. Returns world→cam poses
        with the first frame as identity; the first step's baseline fixes
        the monocular scale, later steps propagate it through shared
        tracks.

        `refine` runs sliding-window bundle adjustment over chained
        multi-frame tracks after pose chaining — the multi-view
        constraints break the two-view rotation/translation ambiguity
        that dominates near-forward motion (ORB-SLAM's local-mapping
        role; two-view chaining alone leaves 5-10x more drift)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        detect = self._detect_fn()
        pair = self._pair_fn()
        f = 0.5 * (self.K[0, 0] + self.K[1, 1])
        inl_th = self.inl_th_px / float(f)

        poses = [np.eye(4)]
        inliers = []
        # keyframe bookkeeping: every frame is tracked against the LAST
        # KEYFRAME; BA chains keyframes only
        kf_frames: List[int] = [0]  # frame index per keyframe
        kf_kps: List[np.ndarray] = []  # keypoints per keyframe
        kf_next: List[np.ndarray] = []  # per kf pair: (K,) next-kf index
        kf_inl: List[np.ndarray] = []  # per kf pair: (K,) track mask
        # non-keyframe anchors: frame -> (kf position, T_rel) so refined
        # keyframe poses re-anchor the in-between frames at the end
        anchors: Dict[int, Tuple[int, np.ndarray]] = {}
        # frames before the first promoted pair (which defines the world
        # scale) get retro-rescaled by their parallax ratio
        pre_boot: List[Tuple[int, float]] = []
        # per-frame cache for loop closure (slam/loop_closure.py): keypoints,
        # descriptors, validity, and the frame's map-depth table
        self.frame_cache: List[Dict[str, np.ndarray]] = []
        kp_kf, d_kf, v_kf = detect(frames[0])
        kf_kps.append(np.asarray(kp_kf))
        self.frame_cache.append({"kp": np.asarray(kp_kf),
                                 "desc": np.asarray(d_kf),
                                 "valid": np.asarray(v_kf),
                                 "depth": np.zeros(kp_kf.shape[0],
                                                   np.float32)})
        Kf = kp_kf.shape[0]
        depth_kf = jnp.zeros((Kf,), jnp.float32)
        has_map = jnp.asarray(False)
        R_kf = jnp.eye(3, dtype=jnp.float32)
        t_kf = jnp.zeros(3, jnp.float32)
        bootstrapped = False
        n_match_kf = Kf  # match support at the last promotion
        skipped = 0
        W = self.window
        for i in range(1, len(frames)):
            key, sub = jax.random.split(key)
            kp_cur, d_cur, v_cur = detect(frames[i])
            (R_cur, t_cur, inl, n_inl, depth_cur, idx, track_mask,
             diag) = pair(
                kp_kf, d_kf, v_kf, kp_cur, d_cur, v_cur,
                self.K, sub, inl_th, depth_kf, has_map, R_kf, t_kf)
            d = np.asarray(diag)
            parallax = float(d[5])
            n_match = int(d[6])
            M = np.eye(4)
            M[:3, :3] = np.asarray(R_cur)
            M[:3, 3] = np.asarray(t_cur)
            poses.append(M)
            inliers.append(int(n_inl))
            promote = (parallax >= self.kf_parallax
                       or skipped >= self.kf_max_skip
                       or n_match < max(self.kf_min_matches,
                                        self.kf_match_decay * n_match_kf)
                       or i == len(frames) - 1)
            if verbose:
                print(f"  [vo] frame {i}: map={int(d[0])} pnp_inl={int(d[1])} "
                      f"use_pnp={bool(d[2])} n_2v={int(d[3])} "
                      f"scale={d[4]:.3f} plx={parallax:.4f} "
                      f"match={n_match} kf={promote}")
            if not promote:
                if not bootstrapped:
                    # no world scale yet: unit-baseline two-view pose,
                    # rescaled once the first keyframe pair fixes scale
                    pre_boot.append((i, parallax))
                else:
                    kf_pose = poses[kf_frames[-1]]
                    anchors[i] = (len(kf_frames) - 1,
                                  M @ np.linalg.inv(kf_pose))
                skipped += 1
                self.frame_cache.append({"kp": np.asarray(kp_cur),
                                         "desc": np.asarray(d_cur),
                                         "valid": np.asarray(v_cur),
                                         "depth": np.asarray(depth_cur)})
                continue
            # --- keyframe promotion -----------------------------------
            if not bootstrapped and pre_boot:
                # the promoted pair's unit baseline defines the world
                # scale; earlier skipped frames observed parallax p_i at
                # unit baseline too, so their true baseline fraction is
                # p_i / p_promoted
                p_p = max(parallax, 1e-6)
                for fi, p_i in pre_boot:
                    poses[fi][:3, 3] *= min(p_i / p_p, 1.0)
                    anchors[fi] = (0, poses[fi].copy())
                pre_boot = []
            bootstrapped = True
            kf_pos = len(kf_frames)
            kf_frames.append(i)
            kf_kps.append(np.asarray(kp_cur))
            kf_next.append(np.asarray(idx[:, 1]))
            # BA tracks use the loose either-model gate, NOT the tight
            # RANSAC inliers: a wrong-but-high-scoring two-view model gates
            # in exactly the observations that reproduce it — the robust
            # multi-view BA must see wider evidence to break ties
            kf_inl.append(np.asarray(track_mask))
            n_match_kf = max(n_match, 1)
            skipped = 0
            depth_kf = depth_cur
            cache_depth = depth_cur
            has_map = jnp.asarray(True)
            if refine and self.incremental_ba and kf_pos >= 2:
                # incremental local BA (ORB-SLAM local-mapping role): refine
                # the last <=W keyframes NOW, before the next tracking
                # step — a bad step is corrected before its error
                # contaminates the map and downstream initializations.
                # incremental_ba="map-only" (round-5): refine the MAP for
                # PnP feedback but keep the chained poses — writing the
                # window-BA poses back mid-run destroyed rotation-dominant
                # trajectories (100-frame degraded loop: refined 5.3% with
                # writes off vs 11-12% with writes on, regardless of map
                # feedback) while the map feedback is what helps the
                # forward walk (1.44% vs 2.31% without incremental BA)
                s = max(0, kf_pos - W + 1)
                kf_poses = [poses[k] for k in kf_frames]
                ba_depth = self._refine_span(kf_kps, kf_next, kf_inl,
                                             kf_poses, s, kf_pos - s + 1,
                                             fix_first=min(
                                                 self.incremental_fix,
                                                 kf_pos - s))
                R_a = poses[kf_frames[s]][:3, :3]
                R_b = poses[kf_frames[kf_pos]][:3, :3]
                cos_span = 0.5 * (np.trace(R_b @ R_a.T) - 1.0)
                rot_span = float(np.arccos(np.clip(cos_span, -1.0, 1.0)))
                if (self.incremental_ba != "map-only"
                        and rot_span <= self.incremental_rot_gate):
                    for j, k in enumerate(kf_frames):
                        poses[k] = kf_poses[j]
                if ba_depth is not None:
                    # the loop-closure CACHE always gets the BA-refined
                    # map (multi-baseline triangulation verifies revisits
                    # better); PnP TRACKING feedback stays gated — it
                    # destroyed the fixating orbit (20.8% vs 10.6%)
                    ba_d = jnp.asarray(ba_depth)
                    cache_depth = jnp.where(ba_d > 0.0, ba_d, depth_kf)
                    if self.ba_map_feedback:
                        # PnP tracks against the BA-refined map where
                        # available; pair-triangulated depths fill the
                        # gaps (new tracks not yet in a refined window)
                        depth_kf = cache_depth
            R_kf = jnp.asarray(poses[i][:3, :3], jnp.float32)
            t_kf = jnp.asarray(poses[i][:3, 3], jnp.float32)
            self.frame_cache.append({"kp": np.asarray(kp_cur),
                                     "desc": np.asarray(d_cur),
                                     "valid": np.asarray(v_cur),
                                     "depth": np.asarray(cache_depth)})
            kp_kf, d_kf, v_kf = kp_cur, d_cur, v_cur
        if refine and 3 <= len(kf_frames) <= self.global_ba_frames:
            # final smoothing pass over the keyframe chain (gauge anchored
            # at the first two keyframes only)
            kf_poses = [poses[k] for k in kf_frames]
            kf_poses = self._refine_tracks(kf_kps, kf_next, kf_inl,
                                           kf_poses)
            for j, k in enumerate(kf_frames):
                poses[k] = kf_poses[j]
        # re-anchor non-keyframe poses onto the refined keyframe chain
        for fi, (kpos, T_rel) in anchors.items():
            poses[fi] = T_rel @ poses[kf_frames[kpos]]
        self.kf_frames = kf_frames
        # stash the keyframe track tables + anchors so a post-hoc global
        # BA (refine_from_cache — e.g. after loop closure) can re-run the
        # same refinement from an updated pose set
        self._kf_tracks = (kf_kps, kf_next, kf_inl)
        self._anchors = dict(anchors)
        return VOResult(poses=poses, num_inliers=inliers)

    def smooth_keyframes(self, poses: List[np.ndarray],
                         skips: Tuple[int, ...] = (2, 4),
                         pg_iters: int = 60,
                         key: Optional[jax.Array] = None
                         ) -> List[np.ndarray]:
        """Skip-edge pose-graph smoothing over the keyframe chain
        (slam/loop_closure.py::smooth_keyframe_graph) + re-anchoring of
        the in-between frames. Requires a prior `run`."""
        if not hasattr(self, "kf_frames"):
            raise RuntimeError("smooth_keyframes requires a prior run()")
        from .loop_closure import smooth_keyframe_graph
        f = 0.5 * float(self.K[0, 0] + self.K[1, 1])
        out = smooth_keyframe_graph(self.frame_cache, poses, self.kf_frames,
                                    np.asarray(self.K), skips=skips,
                                    pg_iters=pg_iters,
                                    inl_th=self.inl_th_px / f, key=key)
        for fi, (kpos, T_rel) in self._anchors.items():
            out[fi] = T_rel @ out[self.kf_frames[kpos]]
        return out

    def refine_from_cache(self, poses: List[np.ndarray]
                          ) -> List[np.ndarray]:
        """Re-run the keyframe bundle adjustment from an UPDATED pose set
        (ORB-SLAM's global-BA-after-loop-closure role) and re-anchor the
        non-keyframes. Uses the track tables cached by the last `run`.

        Caveat: the track set is sequential-pair only — it carries no
        loop-closing observations, so over-iterating from loop-closed
        poses can drift back toward the odometry optimum; callers should
        compare ATE/consistency before and after (see
        benchmarks/ate_bench.py --post-ba)."""
        if not hasattr(self, "_kf_tracks"):
            raise RuntimeError("refine_from_cache requires a prior run()")
        kf_kps, kf_next, kf_inl = self._kf_tracks
        kf_poses = [poses[k] for k in self.kf_frames]
        kf_poses = self._refine_tracks(kf_kps, kf_next, kf_inl, kf_poses)
        out = [p.copy() for p in poses]
        for j, k in enumerate(self.kf_frames):
            out[k] = kf_poses[j]
        for fi, (kpos, T_rel) in self._anchors.items():
            out[fi] = T_rel @ out[self.kf_frames[kpos]]
        return out

    # -- sliding-window BA over chained tracks ----------------------------
    def _ba_window_fn(self, C: int, T_max: int, O_max: int,
                      fix_first: int = 2):
        """Jitted fixed-shape window BA: triangulate tracks from their
        first/last observations, then LM with the first `fix_first`
        cameras fixed. Sliding/incremental windows fix TWO (6-dof frame +
        scale, so overlapping windows stay mutually consistent); the
        GLOBAL pass fixes ONE — freezing keyframe 1's full pose would
        hard-constrain its chained drift into the solution, and the
        monocular scale gauge it was pinning is free to float (Sim3 ATE
        alignment removes it; LM damping keeps the gauge direction tame).
        Measured on the 100-frame degraded orbit: fix-2 global BA
        DEGRADED the chain 10.8% -> 13.5%."""
        key = (C, T_max, O_max, fix_first)
        cache = getattr(self, "_ba_jits", None)
        if cache is None:
            cache = self._ba_jits = {}
        if key in cache:
            return cache[key]
        ba_iters = self.ba_iters
        d_wide, d_cauchy, d_tight = self.gnc_deltas
        # robust deltas are PIXEL thresholds: scale with focal length so
        # the angular gate is resolution-independent (measured: at 480p
        # the unscaled 24 px huber covered too little of the chained-init
        # error distribution and BA converged to a worse basin than the
        # odometry it was refining — walk100 refined 16% vs chained 9%;
        # at 240p the same code gave 3.75% vs 21%)
        s_px = float(0.5 * (self.K[0, 0] + self.K[1, 1])) / 256.0

        @jax.jit
        def fn(R_stack, t_stack, obs_cam, obs_trk, obs_uv, obs_valid,
               tri_cam0, tri_uv0, tri_cam1, tri_uv1, trk_valid, K):
            P_all = projection_from_KRt(
                jnp.broadcast_to(K, (C, 3, 3)), R_stack, t_stack[..., None])
            X = triangulate_points(
                P_all[tri_cam0], P_all[tri_cam1],
                tri_uv0[:, None], tri_uv1[:, None])[:, 0]  # (T, 3)
            # cheirality guard: a track behind either triangulating camera
            # is excluded (its observations masked out)
            Xc0 = jnp.einsum("tij,tj->ti", R_stack[tri_cam0], X) + t_stack[tri_cam0]
            Xc1 = jnp.einsum("tij,tj->ti", R_stack[tri_cam1], X) + t_stack[tri_cam1]
            ok = trk_valid & (Xc0[:, 2] > 1e-4) & (Xc1[:, 2] > 1e-4)
            valid = obs_valid & ok[obs_trk]
            problem = BAProblem(obs_cam, obs_trk, obs_uv, valid, K)
            state0 = BAState(Se3(So3.from_matrix(R_stack), t_stack),
                             jnp.where(ok[:, None], X, 1.0))
            # CONTAMINATION gate (round-5): a track whose links chain two
            # different physical features triangulates to garbage, and its
            # init residuals are huge on EVERY observation — while a good
            # track seen by a drifted camera is off only at that camera.
            # The per-track MEAN init residual separates the two; gating
            # at 2x the wide GNC delta removes merge-contaminated tracks
            # the wide-huber phase would otherwise let drag the poses
            # (measured: the 100-frame degraded orbit's global BA went
            # from degrading the chain to improving it).
            r0 = reprojection_residuals(state0, problem)
            rn = jnp.minimum(jnp.linalg.norm(r0, axis=-1), 400.0)
            cnt = jnp.zeros(T_max).at[obs_trk].add(valid.astype(jnp.float32))
            rsum = jnp.zeros(T_max).at[obs_trk].add(jnp.where(valid, rn, 0.0))
            rmean = rsum / jnp.maximum(cnt, 1.0)
            ok = ok & (rmean < 2.0 * d_wide * s_px)
            valid = obs_valid & ok[obs_trk]
            problem = BAProblem(obs_cam, obs_trk, obs_uv, valid, K)
            # STRUCTURE-ONLY init (round-5): first/last triangulation
            # under a drifted chained init misplaces long-track points so
            # badly that joint LM falls into a local minimum ~2x WORSE
            # than the init (ba_probe.py on the 60-frame degraded orbit:
            # gt-init converges to 2.8%, chained-init to 11.6% — the
            # optimum is fine, the basin path isn't). Freezing ALL
            # cameras for a few iterations pulls the points onto the
            # chained geometry first, so the joint phases start with
            # structure consistent with their own cameras.
            state0, _cs = bundle_adjust(
                state0, problem, C, T_max, num_iters=4,
                robust="huber", robust_delta=d_wide * s_px,
                fix_first_cam=C)
            # graduated non-convexity: a chained init can put a camera
            # 10+ degrees off (reprojections ~40 px), and a tight robust
            # kernel would zero those residuals' influence — so anneal the
            # scale: wide huber pulls gross pose errors in, cauchy handles
            # the true outliers, then a tight re-gated huber polish
            state, c0 = bundle_adjust(
                state0, problem, C, T_max, num_iters=max(ba_iters // 2, 4),
                robust="huber", robust_delta=d_wide * s_px, fix_first_cam=fix_first)
            state, c1 = bundle_adjust(
                state, problem, C, T_max, num_iters=ba_iters,
                robust="cauchy", robust_delta=d_cauchy * s_px,
                fix_first_cam=fix_first)
            # re-gate observations at ~2 px-equivalent and polish with a
            # tight huber — removes the residual outlier bias smooth
            # weighting leaves
            res = reprojection_residuals(state, problem)
            good = valid & (jnp.sum(res * res, -1)
                            < 4.0 * d_tight * d_tight * s_px * s_px)
            problem2 = BAProblem(obs_cam, obs_trk, obs_uv, good, K)
            state, c2 = bundle_adjust(
                state, problem2, C, T_max, num_iters=max(ba_iters // 2, 3),
                robust="huber", robust_delta=d_tight * s_px, fix_first_cam=fix_first)
            return (state.poses.matrix(), state.points, ok,
                    jnp.concatenate([c0, c1, c2]))

        cache[key] = fn
        return fn

    def _refine_tracks(self, kps: List[np.ndarray], pair_next: List[np.ndarray],
                       pair_inl: List[np.ndarray], poses: List[np.ndarray]
                       ) -> List[np.ndarray]:
        """Chain per-pair inlier matches into multi-frame tracks and
        bundle-adjust (host-side bookkeeping between two jitted
        executables).

        Sequences up to `global_ba_frames` are refined as ONE window —
        anchoring only the gauge (first two poses) lets BA correct every
        chaining error. Longer sequences fall back to sliding windows of
        `self.window` frames with stride W-2 (each window inherits two
        refined anchors from its predecessor; drift beyond the window
        horizon is the usual odometry behavior — loop closure lives in
        slam/posegraph.py)."""
        N = len(kps)
        if N >= 3 and N <= self.global_ba_frames:
            # TWO passes over the global window: the second pass
            # re-triangulates every track from the PASS-1 refined poses,
            # so tracks whose first/last-observation triangulation was
            # poisoned by chained-pose drift get a sane init and the GNC
            # schedule restarts in the better basin (measured on the
            # 100-frame degraded circuit: single pass leaves the refined
            # ATE well short of what the same solver reaches from the
            # once-refined chain)
            poses = [p.copy() for p in poses]
            for _ in range(self.global_ba_passes):
                self._refine_span(kps, pair_next, pair_inl, poses, 0, N,
                                  fix_first=1)
            return poses
        else:
            W = min(self.window, N)
            if W < 3:
                return poses
            starts = list(range(0, N - W + 1, W - 2))
            if starts[-1] != N - W:
                starts.append(N - W)
            windows = [(s, W) for s in starts]
        poses = [p.copy() for p in poses]
        for s, W in windows:
            self._refine_span(kps, pair_next, pair_inl, poses, s, W)
        return poses

    def _refine_span(self, kps, pair_next, pair_inl, poses, s: int, W: int,
                     fix_first: int = 2):
        """Bundle-adjust frames [s, s+W) in place (first `fix_first` fixed).

        Returns the refined map depth table for frame s+W-1 — (Kf,) z in
        that camera, world scale, 0 where no refined track exists — or
        None when the window could not be built. The tracker's PnP runs
        against THIS map (BA-refined, multi-baseline triangulation), not
        the noisy single-pair triangulations."""
        if W < 3:
            return None
        Kf = kps[0].shape[0]
        # track budget: keeps the dense Schur coupling block (C, T, 6, 3)
        # HBM-friendly at long-window sizes
        T_budget = min(Kf * (W - 1), self.ba_track_budget)
        O_budget = min(2 * Kf * (W - 1), Kf * W)
        built = self._build_window_tracks(kps, pair_next, pair_inl, s, W,
                                          T_budget, O_budget)
        if built is None:
            return None
        (obs_cam, obs_trk, obs_uv, obs_valid, first_cam, first_uv,
         last_cam, last_uv, trk_valid, kp_at_last) = built
        ba = self._ba_window_fn(W, T_budget, O_budget, fix_first)
        R_stack = jnp.asarray(
            np.stack([poses[s + i][:3, :3] for i in range(W)]), jnp.float32)
        t_stack = jnp.asarray(
            np.stack([poses[s + i][:3, 3] for i in range(W)]), jnp.float32)
        M, X, ok, _costs = ba(
            R_stack, t_stack,
            jnp.asarray(obs_cam, jnp.int32), jnp.asarray(obs_trk, jnp.int32),
            jnp.asarray(obs_uv), jnp.asarray(obs_valid),
            jnp.asarray(first_cam, jnp.int32), jnp.asarray(first_uv),
            jnp.asarray(last_cam, jnp.int32), jnp.asarray(last_uv),
            jnp.asarray(trk_valid), self.K.astype(jnp.float32))
        M = np.asarray(M)
        for i in range(fix_first, W):
            poses[s + i] = M[i]
        # refined map for the newest frame: depth of each surviving track
        # in camera s+W-1
        X = np.asarray(X)
        ok = np.asarray(ok)
        Rl, tl = M[W - 1][:3, :3], M[W - 1][:3, 3]
        z_last = X @ Rl[2] + tl[2]  # (T,)
        has = kp_at_last >= 0
        tid = np.where(has, kp_at_last, 0)
        depth = np.where(has & ok[tid] & (z_last[tid] > 1e-3),
                         z_last[tid], 0.0).astype(np.float32)
        return depth

    def _build_window_tracks(self, kps, pair_next, pair_inl, s: int, W: int,
                             T_budget: int, O_budget: int):
        """Chain tracks over frames [s, s+W); pad to (T_budget, O_budget)
        static shapes, keeping the LONGEST tracks when over budget."""
        Kf = kps[0].shape[0]
        track_of = np.full((W, Kf), -1, np.int64)
        n_trk = 0
        cams, trks, uvs = [], [], []
        first_cam = np.zeros(Kf * (W - 1), np.int64)
        first_kp = np.zeros(Kf * (W - 1), np.int64)
        for f in range(W - 1):
            nxt = pair_next[s + f]
            inl = pair_inl[s + f]
            js = np.nonzero(inl)[0]
            tids = track_of[f, js]
            new = tids < 0
            n_new = int(new.sum())
            new_ids = np.arange(n_trk, n_trk + n_new)
            tids = tids.copy()
            tids[new] = new_ids
            first_cam[new_ids] = f
            first_kp[new_ids] = js[new]
            n_trk += n_new
            # new tracks contribute their first observation
            cams.append(np.full(n_new, f))
            trks.append(new_ids)
            uvs.append(kps[s + f][js[new]])
            # all inlier matches contribute the next-frame observation
            cams.append(np.full(js.shape[0], f + 1))
            trks.append(tids)
            uvs.append(kps[s + f + 1][nxt[js]])
            track_of[f + 1, nxt[js]] = tids
        if n_trk < 8:
            return None
        obs_cam_all = np.concatenate(cams)
        obs_trk_all = np.concatenate(trks)
        obs_uv_all = np.concatenate(uvs).astype(np.float32)

        lengths = np.bincount(obs_trk_all, minlength=n_trk)
        kp_at_last = track_of[W - 1].copy()  # (Kf,) track id per keypoint
        if n_trk > T_budget or obs_cam_all.shape[0] > O_budget:
            # STRATIFIED selection: round-robin the longest tracks from
            # each first-frame bucket. Pure longest-first starved whole
            # pair-slots of observations at global-BA scale (~100 kf x
            # 512 kp -> ~20k tracks vs a 4k budget): long-lived, low-
            # parallax features crowded out the short tracks that carry
            # each step's baseline/scale, warping the circuit (round-5
            # full-scale finding: global BA degraded 4.8% -> 14.5%).
            # Round-robin keeps every inter-frame link constrained while
            # still preferring multi-view tracks within each slot.
            by_frame = [[] for _ in range(W)]
            order = np.argsort(-lengths[:n_trk], kind="stable")
            for t in order:
                by_frame[first_cam[t]].append(t)
            keep_list = []
            ptr = [0] * W
            while len(keep_list) < min(n_trk, T_budget):
                advanced = False
                for f in range(W):
                    if ptr[f] < len(by_frame[f]) and len(keep_list) < T_budget:
                        keep_list.append(by_frame[f][ptr[f]])
                        ptr[f] += 1
                        advanced = True
                if not advanced:
                    break
            keep = np.asarray(keep_list, np.int64)
            # trim further until the observation budget fits
            csum = np.cumsum(lengths[keep])
            n_keep = int(np.searchsorted(csum, O_budget, side="right"))
            keep = keep[:max(n_keep, 8)]
            remap = np.full(n_trk, -1, np.int64)
            remap[keep] = np.arange(keep.shape[0])
            sel = remap[obs_trk_all] >= 0
            obs_cam_all = obs_cam_all[sel]
            obs_trk_all = remap[obs_trk_all[sel]]
            obs_uv_all = obs_uv_all[sel]
            first_cam = first_cam[keep]
            first_kp = first_kp[keep]
            kp_at_last = np.where(kp_at_last >= 0, remap[kp_at_last], -1)
            n_trk = keep.shape[0]
        n_obs = obs_cam_all.shape[0]
        if n_obs > O_budget or n_trk < 8:
            return None

        obs_cam = np.zeros(O_budget, np.int64)
        obs_trk = np.zeros(O_budget, np.int64)
        obs_uv = np.zeros((O_budget, 2), np.float32)
        obs_valid = np.zeros(O_budget, bool)
        obs_cam[:n_obs] = obs_cam_all
        obs_trk[:n_obs] = obs_trk_all
        obs_uv[:n_obs] = obs_uv_all
        obs_valid[:n_obs] = True

        # first/last observation per track (triangulation baselines);
        # duplicate-index assignment keeps the LAST occurrence and the
        # observations are appended in frame order
        fc = np.zeros(T_budget, np.int64)
        fuv = np.zeros((T_budget, 2), np.float32)
        lc = np.zeros(T_budget, np.int64)
        luv = np.zeros((T_budget, 2), np.float32)
        lc[obs_trk_all] = obs_cam_all
        luv[obs_trk_all] = obs_uv_all
        kp_stack = np.stack(kps[s:s + W])  # (W, Kf, 2)
        fc[:n_trk] = first_cam[:n_trk]
        fuv[:n_trk] = kp_stack[first_cam[:n_trk], first_kp[:n_trk]]
        trk_valid = np.zeros(T_budget, bool)
        trk_valid[:n_trk] = lc[:n_trk] > fc[:n_trk]
        return (obs_cam, obs_trk, obs_uv, obs_valid, fc, fuv, lc, luv,
                trk_valid, kp_at_last)

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
