"""Incremental structure-from-motion (north-star config 4: keyframe
selection → matching → global BA; no reference counterpart — kornia stops
at two-view geometry).

Operates on observation TRACKS (point id ↔ per-view pixel) — the output of
any matcher front end. Pipeline:
  1. initialize from the best two-view pair (essential → pose + triangulate),
  2. for each remaining view: PnP on already-reconstructed points,
  3. triangulate newly-covered points,
  4. global LM bundle adjustment (slam.ba, Schur on the MXU).
Static shapes: fixed numbers of views/points with validity masks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.calibration import solve_pnp_dlt
from ..geometry.conversions import normalize_points_with_intrinsics
from ..geometry.epipolar import (
    motion_from_essential_choose_solution,
    projection_from_KRt,
    run_5point,
    sampson_epipolar_distance,
    triangulate_points,
)
from ..geometry.liegroup import Se3, So3
from .ba import BAProblem, BAState, bundle_adjust, reprojection_residuals

__all__ = ["incremental_sfm", "SfmResult"]


@dataclasses.dataclass
class SfmResult:
    poses: Se3  # (V,) world→camera
    points: jax.Array  # (P, 3)
    point_valid: np.ndarray  # (P,)
    final_rms: float


def incremental_sfm(
    observations: jax.Array,  # (V, P, 2) pixel observations
    visible: jax.Array,  # (V, P) bool
    K: jax.Array,  # (3, 3)
    ba_iters: int = 10,
    key: Optional[jax.Array] = None,
) -> SfmResult:
    """Reconstruct cameras + points from multi-view tracks."""
    if key is None:
        key = jax.random.PRNGKey(0)
    obs = np.asarray(observations)
    vis = np.asarray(visible)
    V, P, _ = obs.shape

    # --- 1. initialize from views (0, 1) ------------------------------------
    both = vis[0] & vis[1]
    x0 = normalize_points_with_intrinsics(jnp.asarray(obs[0][both]), K)
    x1 = normalize_points_with_intrinsics(jnp.asarray(obs[1][both]), K)
    E_cands = run_5point(x0[None, :5], x1[None, :5])
    NC = E_cands.shape[1]
    res = jnp.stack([
        sampson_epipolar_distance(x0[None], x1[None], E_cands[:, i]).max()
        for i in range(NC)])
    valid_c = jnp.linalg.norm(E_cands.reshape(1, NC, 9), axis=-1)[0] > 0.5
    best = jnp.argmin(jnp.where(valid_c, res, jnp.inf))
    E = E_cands[0, best]
    R1, t1, _ = motion_from_essential_choose_solution(
        E[None], jnp.eye(3)[None], jnp.eye(3)[None], x0[None], x1[None])
    poses_np = [np.eye(4)]
    M1 = np.eye(4)
    M1[:3, :3] = np.asarray(R1[0])
    M1[:3, 3] = np.asarray(t1[0][:, 0])
    poses_np.append(M1)

    # triangulate the initial map
    P0 = projection_from_KRt(K[None], jnp.eye(3)[None], jnp.zeros((1, 3, 1)))
    P1m = projection_from_KRt(K[None], R1, t1)
    X01 = triangulate_points(P0, P1m, jnp.asarray(obs[0][both])[None],
                             jnp.asarray(obs[1][both])[None])[0]
    points = np.zeros((P, 3), np.float32)
    point_ok = np.zeros(P, bool)
    idx_both = np.where(both)[0]
    X01n = np.asarray(X01)
    in_front = X01n[:, 2] > 0.1
    points[idx_both[in_front]] = X01n[in_front]
    point_ok[idx_both[in_front]] = True

    # --- 2. register remaining views by PnP + triangulate new points --------
    for v in range(2, V):
        seen = vis[v] & point_ok
        if seen.sum() >= 6:
            Rt = solve_pnp_dlt(
                jnp.asarray(points[seen])[None],
                jnp.asarray(obs[v][seen])[None], K[None])[0]
            Mv = np.eye(4)
            Mv[:3, :] = np.asarray(Rt)
        else:  # fall back: chain the previous pose
            Mv = poses_np[-1].copy()
        poses_np.append(Mv)
        # triangulate points first seen by (0, v)
        new = vis[0] & vis[v] & ~point_ok
        if new.sum() > 0:
            Pv = projection_from_KRt(
                K[None], jnp.asarray(Mv[None, :3, :3]),
                jnp.asarray(Mv[None, :3, 3:4]))
            Xn = triangulate_points(P0, Pv, jnp.asarray(obs[0][new])[None],
                                    jnp.asarray(obs[v][new])[None])[0]
            Xnn = np.asarray(Xn)
            okn = Xnn[:, 2] > 0.1
            idx_new = np.where(new)[0]
            points[idx_new[okn]] = Xnn[okn]
            point_ok[idx_new[okn]] = True

    # --- 3. global bundle adjustment ----------------------------------------
    cam_idx, pt_idx, uvs = [], [], []
    # compact point indexing over reconstructed points only
    pt_map = -np.ones(P, np.int64)
    pt_map[point_ok] = np.arange(point_ok.sum())
    for v in range(V):
        sel = vis[v] & point_ok
        ids = np.where(sel)[0]
        cam_idx.append(np.full(ids.size, v))
        pt_idx.append(pt_map[ids])
        uvs.append(obs[v][ids])
    cam_idx = jnp.asarray(np.concatenate(cam_idx), jnp.int32)
    pt_idx = jnp.asarray(np.concatenate(pt_idx), jnp.int32)
    uv = jnp.asarray(np.concatenate(uvs), jnp.float32)
    problem = BAProblem(cam_idx, pt_idx, uv,
                        jnp.ones(cam_idx.shape[0], bool), K)
    R_stack = jnp.asarray(np.stack([M[:3, :3] for M in poses_np]))
    t_stack = jnp.asarray(np.stack([M[:3, 3] for M in poses_np]))
    state0 = BAState(Se3(So3.from_matrix(R_stack), t_stack),
                     jnp.asarray(points[point_ok]))
    n_pts = int(point_ok.sum())
    state, costs = bundle_adjust(state0, problem, V, n_pts,
                                 num_iters=ba_iters, robust="cauchy",
                                 robust_delta=3.0)

    # --- 4. re-triangulate from refined poses + second BA round -------------
    # badly-initialized points survive robust BA as downweighted outliers;
    # re-triangulating every point from the refined first/last observing
    # views resets them into the basin, and a short second BA polishes.
    R_ref = np.asarray(state.poses.r.matrix())
    t_ref = np.asarray(state.poses.t)
    Ps = [projection_from_KRt(K[None], jnp.asarray(R_ref[v][None]),
                              jnp.asarray(t_ref[v][None, :, None]))
          for v in range(V)]
    pts_new = np.asarray(state.points).copy()
    ids_rec = np.where(point_ok)[0]
    for ci, pid in enumerate(ids_rec):
        views = np.where(vis[:, pid])[0]
        if views.size < 2:
            continue
        v0, v1 = int(views[0]), int(views[-1])
        X = triangulate_points(
            Ps[v0], Ps[v1], jnp.asarray(obs[v0, pid][None, None]),
            jnp.asarray(obs[v1, pid][None, None]))[0, 0]
        Xn = np.asarray(X)
        if np.isfinite(Xn).all():
            pts_new[ci] = Xn
    state1 = BAState(state.poses, jnp.asarray(pts_new))
    state, _ = bundle_adjust(state1, problem, V, n_pts,
                             num_iters=max(ba_iters // 2, 4),
                             robust="cauchy", robust_delta=3.0)
    r = reprojection_residuals(state, problem)
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(r**2, -1))))
    return SfmResult(poses=state.poses, points=state.points,
                     point_valid=point_ok, final_rms=rms)
