"""Loop detection + closure for the VO/SLAM front end (VERDICT r2 item 2).

No single reference counterpart — kornia has pose-graph-free tracking only
(the closest precedent is match-vs-target chaining in
tracking/planar_tracker.py:216). Pipeline:

1. **Place recognition**: one pooled global descriptor per frame
   (L2-normalized sum of the frame's valid local descriptors — a
   smoothed-BoW retrieval signature over the VO's own SIFT descriptors;
   no extra network). Candidates = best cosine match among frames at
   least `min_separation` back.
2. **Geometric verification**: mutual-SNN match of the candidate pair's
   cached descriptors, then PnP RANSAC of the query frame's 2D points
   against the candidate's back-projected map (the VO depth table) — a
   3D-2D solve, so the loop edge carries METRIC scale, unlike an
   essential-matrix check.
3. **Closure**: accepted edges + odometry edges form a `PoseGraph`
   (slam/posegraph.py); LM on the manifold redistributes the accumulated
   drift around the cycle.

All verification math is one jitted executable (static shapes, padded-K);
candidate selection is trivial host-side argmax bookkeeping.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.calibration import pnp_ransac
from ..geometry.conversions import normalize_points_with_intrinsics
from ..geometry.liegroup import Se3, So3
from ..feature.matching import match_smnn
from .posegraph import (PoseGraph, optimize_pose_graph,
                        optimize_pose_graph_sim3)

__all__ = ["LoopEdge", "global_descriptors", "detect_loop_candidates",
           "verify_loop", "close_loops"]


@dataclasses.dataclass
class LoopEdge:
    i: int  # query frame
    j: int  # revisited frame (j < i)
    num_inliers: int
    similarity: float
    T_rel: np.ndarray  # (4, 4) measured T_j^{-1} T_i (world→cam convention)


def global_descriptors(frame_cache: List[Dict[str, np.ndarray]]
                       ) -> np.ndarray:
    """(F, D) pooled place-recognition signatures from cached per-frame
    local descriptors.

    Raw sum-pooled SIFT is nearly constant across views of one scene (the
    texture statistics dominate); subtracting the sequence-mean pooled
    vector before the final normalize (VLAD-style centering) is what makes
    the signature place-discriminative."""
    pooled = []
    for fc in frame_cache:
        d = fc["desc"] * fc["valid"][:, None]
        g = d.sum(0)
        pooled.append(g / max(float(np.linalg.norm(g)), 1e-9))
    G = np.stack(pooled)
    G = G - G.mean(0, keepdims=True)
    return G / np.maximum(np.linalg.norm(G, axis=1, keepdims=True), 1e-9)


def detect_loop_candidates(gdesc: np.ndarray, min_separation: int = 10,
                           sim_th: float = 0.85,
                           max_candidates: int = 8
                           ) -> List[Tuple[int, int, float]]:
    """Best past match per frame, excluding the temporal neighborhood.
    Returns [(i, j, sim)] sorted by similarity, at most `max_candidates`
    (consecutive query frames matching the same revisit region are
    deduplicated to the strongest)."""
    F = gdesc.shape[0]
    sims = gdesc @ gdesc.T
    cands: List[Tuple[int, int, float]] = []
    for i in range(min_separation, F):
        past = sims[i, : i - min_separation + 1]
        j = int(np.argmax(past))
        s = float(past[j])
        if s >= sim_th:
            cands.append((i, j, s))
    cands.sort(key=lambda c: -c[2])
    picked: List[Tuple[int, int, float]] = []
    for i, j, s in cands:
        if any(abs(i - pi) < 3 for pi, _, _ in picked):
            continue
        picked.append((i, j, s))
        if len(picked) >= max_candidates:
            break
    return picked


_VERIFY_CACHE: Dict[Tuple, object] = {}


def _verify_fn(Kf: int, matcher_th: float, ransac_batch: int,
               gn_iters: int):
    key = (Kf, matcher_th, ransac_batch, gn_iters)
    if key in _VERIFY_CACHE:
        return _VERIFY_CACHE[key]

    @jax.jit
    def fn(kp_j, d_j, v_j, depth_j, R_j, t_j, kp_i, d_i, v_i, K, rkey,
           inl_th):
        """Match j→i, back-project j's map, PnP the query frame."""
        dists, idx, mvalid = match_smnn(d_j, d_i, matcher_th, v_j, v_i)
        x_j = normalize_points_with_intrinsics(kp_j, K)
        x_i = normalize_points_with_intrinsics(kp_i[idx[:, 1]], K)
        xh = jnp.concatenate([x_j, jnp.ones_like(x_j[:, :1])], -1)
        Xc = depth_j[:, None] * xh
        Xw = (Xc - t_j) @ R_j  # R_j^T (Xc - t_j)
        map_ok = mvalid & (depth_j > 0.0)
        R, t, inl, n = pnp_ransac(Xw, x_i, rkey, 2.0 * inl_th,
                                  mask=map_ok, batch_size=ransac_batch,
                                  gn_iters=gn_iters)
        return R, t, n, jnp.sum(map_ok)

    _VERIFY_CACHE[key] = fn
    return fn


def verify_loop(frame_cache, poses, i: int, j: int, K,
                matcher_th: float = 0.95, inl_th: float = 2e-3,
                ransac_batch: int = 512, key: Optional[jax.Array] = None
                ) -> Tuple[Optional[np.ndarray], int, int]:
    """PnP-verify candidate (i revisits j). The MAP frame is whichever of
    the two has the denser depth table (frame 0 never has one); the other
    frame's 2D points solve PnP against its back-projected 3D points.
    Returns (T_rel (4, 4) measured meas(j→i) = T_j⁻¹ T_i, n_inliers,
    n_map); T_rel is None when neither frame carries a map."""
    if key is None:
        key = jax.random.PRNGKey(i * 9973 + j)
    di = int((frame_cache[i]["depth"] > 0).sum())
    dj = int((frame_cache[j]["depth"] > 0).sum())
    if max(di, dj) == 0:
        return None, 0, 0

    def _try(m: int, q: int):
        """PnP the query frame q against map frame m's depth table."""
        fm, fq = frame_cache[m], frame_cache[q]
        fn = _verify_fn(fm["kp"].shape[0], matcher_th, ransac_batch, 5)
        R, t, n, n_map = fn(
            jnp.asarray(fm["kp"]), jnp.asarray(fm["desc"]),
            jnp.asarray(fm["valid"]), jnp.asarray(fm["depth"]),
            jnp.asarray(poses[m][:3, :3], jnp.float32),
            jnp.asarray(poses[m][:3, 3], jnp.float32),
            jnp.asarray(fq["kp"]), jnp.asarray(fq["desc"]),
            jnp.asarray(fq["valid"]), jnp.asarray(K, jnp.float32), key,
            jnp.asarray(inl_th, jnp.float32))
        T_q = np.eye(4, dtype=np.float64)
        T_q[:3, :3] = np.asarray(R)
        T_q[:3, 3] = np.asarray(t)
        if q == i:  # measured pose of i in m=j's drift-local frame
            T_rel = np.linalg.inv(poses[j]) @ T_q
        else:  # measured pose of j against i's map
            T_rel = np.linalg.inv(T_q) @ poses[i]
        return T_rel, int(n), int(n_map)

    # try BOTH directions when both frames carry a map: degraded revisits
    # often verify cleanly against one frame's map but not the other's
    # (round-4: the denser-map-only choice dropped a true edge at 10/52
    # while the other direction verified at 20/50)
    cands = [(i, j)] if dj == 0 else ([(j, i)] if di == 0 else
                                     [(i, j), (j, i)])
    best = None
    for m, q in cands:
        T_rel, n, n_map = _try(m, q)
        if best is None or n > best[1]:
            best = (T_rel, n, n_map)
    return best


def close_loops(frame_cache, poses, K, min_separation: int = 10,
                sim_th: float = 0.85, min_inliers: int = 15,
                min_inlier_frac: float = 0.35, loop_weight: float = 3.0,
                pg_iters: int = 25, inl_th: float = 2e-3,
                optimizer: str = "se3",
                key: Optional[jax.Array] = None
                ) -> Tuple[List[np.ndarray], List[LoopEdge]]:
    """Detect, verify, and close loops over a finished VO run.

    frame_cache: `VisualOdometry.frame_cache`; poses: (4, 4) world→cam
    per frame. Returns (corrected poses, accepted LoopEdges). With no
    accepted loop the poses are returned unchanged (no spurious smoothing).

    Acceptance is FRACTION-dominant (inliers >= min_inlier_frac of the
    map-backed matches, with a moderate absolute floor): degraded /
    sparse-map revisits have few map matches but near-unanimous PnP
    support (measured: true revisits at 24/28 and 18/48 vs junk
    candidates at 0/3-0/4), so a large absolute floor or a too-high
    fraction rejects exactly the real loops.

    optimizer: "se3" (default) or "sim3". With a single loop edge the
    rigid Se3 graph is better conditioned (measured on the rendered
    circuit: 5.2% -> 3.7% ATE vs 4.6% for Sim3); "sim3" adds per-node
    scale (ORB-SLAM's essential-graph choice) and pays off on long
    sequences with several loop edges where scale drift dominates.
    """
    F = len(poses)
    gdesc = global_descriptors(frame_cache)
    cands = detect_loop_candidates(gdesc, min_separation, sim_th)
    edges: List[LoopEdge] = []
    for i, j, s in cands:
        T_rel, n, n_map = verify_loop(frame_cache, poses, i, j, K,
                                      inl_th=inl_th, key=key)
        if (T_rel is not None and n >= min_inliers
                and n >= min_inlier_frac * max(n_map, 1)):
            edges.append(LoopEdge(i=i, j=j, num_inliers=n, similarity=s,
                                  T_rel=T_rel))
    if not edges:
        return [p.copy() for p in poses], edges

    # pose graph: odometry chain + loop edges (meas(src→dst) = T_src⁻¹ T_dst,
    # the convention of slam/posegraph.py::_edge_residual)
    src = list(range(F - 1)) + [e.j for e in edges]
    dst = list(range(1, F)) + [e.i for e in edges]
    rels = [np.linalg.inv(poses[k]) @ poses[k + 1] for k in range(F - 1)]
    rels += [e.T_rel for e in edges]
    weights = [1.0] * (F - 1) + [loop_weight * min(e.num_inliers, 100) / 30.0
                                 for e in edges]
    R_stack = jnp.asarray(np.stack([T[:3, :3] for T in rels]), jnp.float32)
    t_stack = jnp.asarray(np.stack([T[:3, 3] for T in rels]), jnp.float32)
    meas = Se3(So3.from_matrix(R_stack), t_stack)
    node_R = jnp.asarray(np.stack([p[:3, :3] for p in poses]), jnp.float32)
    node_t = jnp.asarray(np.stack([p[:3, 3] for p in poses]), jnp.float32)
    nodes = Se3(So3.from_matrix(node_R), node_t)
    graph = PoseGraph(jnp.asarray(src, jnp.int32),
                      jnp.asarray(dst, jnp.int32), meas,
                      jnp.asarray(weights, jnp.float32),
                      jnp.ones(len(src), bool))
    if optimizer == "sim3":
        # verified loop edges are NOT robustified (a huge delta): the one
        # informative edge must not be down-weighted for carrying exactly
        # the big residual it exists to close
        opt, _scales, _costs = optimize_pose_graph_sim3(
            nodes, graph, num_iters=pg_iters, robust_delta=1e6)
    else:
        opt, _costs = optimize_pose_graph(nodes, graph, num_iters=pg_iters)
    M = np.asarray(opt.matrix())
    return [M[k] for k in range(F)], edges


def smooth_keyframe_graph(frame_cache, poses, kf_frames, K,
                          skips: Tuple[int, ...] = (2, 4),
                          min_inliers: int = 20, pg_iters: int = 60,
                          inl_th: float = 2e-3,
                          key: Optional[jax.Array] = None
                          ) -> List[np.ndarray]:
    """Short-range SKIP-EDGE pose graph over the keyframe chain.

    Chained odometry drift is a random walk over sequential steps; PnP
    edges between keyframes `s` apart (the same map-verification used for
    loop closure, so the edges carry world scale) cut the effective path
    length by `s` and the accumulated drift by ~sqrt(s) — the SfM
    view-graph idea applied locally. No reference counterpart (kornia has
    no pose-graph machinery); measured on the 100-frame degraded orbit as
    the only pipeline stage that improves on plain chaining (global BA's
    optimum there is displaced by the fixating geometry's bas-relief
    valley — see benchmarks/ba_probe.py).

    poses: per-FRAME world→cam poses. kf_frames: frame index per
    keyframe. Returns corrected per-frame poses (keyframes moved by the
    graph; in-between frames must be re-anchored by the caller — see
    VisualOdometry.smooth_keyframes).
    """
    n = len(kf_frames)
    if n < 3:
        return [p.copy() for p in poses]
    src, dst, rels, weights = [], [], [], []
    for a in range(n - 1):
        fa, fb = kf_frames[a], kf_frames[a + 1]
        src.append(a)
        dst.append(a + 1)
        rels.append(np.linalg.inv(poses[fa]) @ poses[fb])
        weights.append(1.0)
    for s in skips:
        for a in range(n - s):
            fa, fb = kf_frames[a], kf_frames[a + s]
            T_rel, n_inl, n_map = verify_loop(frame_cache, poses, fb, fa, K,
                                              inl_th=inl_th, key=key)
            if T_rel is None or n_inl < min_inliers:
                continue
            src.append(a)
            dst.append(a + s)
            rels.append(T_rel)  # meas(fa→fb) = T_fa⁻¹ T_fb
            weights.append(min(n_inl, 100) / 30.0)
    if len(src) == n - 1:  # no skip edge verified: nothing to smooth
        return [p.copy() for p in poses]
    R_stack = jnp.asarray(np.stack([T[:3, :3] for T in rels]), jnp.float32)
    t_stack = jnp.asarray(np.stack([T[:3, 3] for T in rels]), jnp.float32)
    meas = Se3(So3.from_matrix(R_stack), t_stack)
    kf_poses = [poses[k] for k in kf_frames]
    node_R = jnp.asarray(np.stack([p[:3, :3] for p in kf_poses]), jnp.float32)
    node_t = jnp.asarray(np.stack([p[:3, 3] for p in kf_poses]), jnp.float32)
    nodes = Se3(So3.from_matrix(node_R), node_t)
    graph = PoseGraph(jnp.asarray(src, jnp.int32),
                      jnp.asarray(dst, jnp.int32), meas,
                      jnp.asarray(weights, jnp.float32),
                      jnp.ones(len(src), bool))
    opt, _costs = optimize_pose_graph(nodes, graph, num_iters=pg_iters)
    M = np.asarray(opt.matrix())
    out = [p.copy() for p in poses]
    for a, k in enumerate(kf_frames):
        out[k] = M[a]
    return out
