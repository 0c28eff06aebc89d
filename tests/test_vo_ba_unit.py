"""Fast unit tests for the round-5 window-BA machinery (no rendering):
structure-only gauge freezing, the contamination gate, and the window BA
improving a perturbed init on clean synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.slam.ba import BAProblem, BAState, bundle_adjust
from kornia_tpu.slam.vo import VisualOdometry
from kornia_tpu.geometry.liegroup import Se3, So3


def _synthetic_problem(C=4, P=60, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    K = jnp.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1.0]])
    Xw = rng.uniform(-1.5, 1.5, (P, 3)).astype(np.float32)
    Xw[:, 2] += 5.0
    ts = np.stack([np.linspace(0, 1.2, C), np.zeros(C), np.zeros(C)],
                  1).astype(np.float32)
    angs = rng.normal(0, 0.02, (C, 3)).astype(np.float32)
    poses = Se3(So3.exp(jnp.asarray(angs)), jnp.asarray(ts))
    Rm = np.asarray(poses.r.matrix())
    cam = np.repeat(np.arange(C), P).astype(np.int32)
    pt = np.tile(np.arange(P), C).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rm[cam], Xw[pt]) + ts[cam]
    uv = (Xc[:, :2] / Xc[:, 2:]) * 200.0 + np.array([128.0, 96.0])
    uv += rng.normal(0, noise, uv.shape)
    problem = BAProblem(jnp.asarray(cam), jnp.asarray(pt),
                        jnp.asarray(uv.astype(np.float32)),
                        jnp.ones(cam.shape[0], bool), K)
    return problem, poses, jnp.asarray(Xw), C, P


def test_structure_only_freezes_all_cameras():
    problem, poses, Xw, C, P = _synthetic_problem()
    rng = np.random.default_rng(1)
    bad_X = Xw + jnp.asarray(rng.normal(0, 0.3, (P, 3)).astype(np.float32))
    state0 = BAState(poses, bad_X)
    state, costs = bundle_adjust(state0, problem, C, P, num_iters=6,
                                 robust="huber", robust_delta=50.0,
                                 fix_first_cam=C)
    # cameras bit-identical, points moved toward truth
    np.testing.assert_array_equal(np.asarray(state.poses.t),
                                  np.asarray(poses.t))
    np.testing.assert_array_equal(np.asarray(state.poses.r.q.data),
                                  np.asarray(poses.r.q.data))
    err0 = float(jnp.linalg.norm(bad_X - Xw))
    err1 = float(jnp.linalg.norm(state.points - Xw))
    assert err1 < 0.2 * err0, (err0, err1)


def test_window_ba_improves_perturbed_poses():
    """Exercise VisualOdometry's jitted window-BA executable directly on
    synthetic per-pair tracks: a perturbed chain must move toward GT."""
    rng = np.random.default_rng(2)
    K = jnp.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1.0]],
                  jnp.float32)
    vo = VisualOdometry(K, num_features=64)
    W, Kf = 4, 64
    Xw = rng.uniform(-1.5, 1.5, (Kf, 3)).astype(np.float32)
    Xw[:, 2] += 5.0
    gt = []
    for i in range(W):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.4 * i, 0.0, 0.0]
        gt.append(T)
    kps, nexts, inls = [], [], []
    for i in range(W):
        Xc = Xw @ gt[i][:3, :3].T + gt[i][:3, 3]
        uv = (Xc[:, :2] / Xc[:, 2:]) * 200.0 + np.array([128.0, 96.0])
        kps.append(uv.astype(np.float32))
        if i:
            nexts.append(np.arange(Kf))
            inls.append(np.ones(Kf, bool))
    poses = [g.copy() for g in gt]
    for i in range(2, W):  # perturb the non-gauge cameras
        poses[i][:3, 3] += rng.normal(0, 0.06, 3)
    err0 = sum(np.linalg.norm(poses[i][:3, 3] - gt[i][:3, 3])
               for i in range(W))
    vo._refine_span(kps, nexts, inls, poses, 0, W)
    err1 = sum(np.linalg.norm(poses[i][:3, 3] - gt[i][:3, 3])
               for i in range(W))
    assert err1 < 0.35 * err0, (err0, err1)


def test_contamination_gate_drops_merged_track():
    """A track whose observations mix two far-apart 3D points must be
    excluded by the mean-init-residual gate (ok=False), while clean
    tracks survive."""
    rng = np.random.default_rng(3)
    K = jnp.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1.0]],
                  jnp.float32)
    vo = VisualOdometry(K, num_features=32)
    W, Kf = 4, 32
    Xw = rng.uniform(-1.5, 1.5, (Kf, 3)).astype(np.float32)
    Xw[:, 2] += 5.0
    gt = []
    for i in range(W):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.4 * i, 0.0, 0.0]
        gt.append(T)
    kps, nexts, inls = [], [], []
    for i in range(W):
        Xc = Xw @ gt[i][:3, :3].T + gt[i][:3, 3]
        uv = (Xc[:, :2] / Xc[:, 2:]) * 200.0 + np.array([128.0, 96.0])
        # contaminate keypoint 0 in the last frame: it jumps to where
        # keypoint 1 projects (a wrong match merging two features)
        if i == W - 1:
            uv[0] = uv[1] + np.array([90.0, 70.0])
        kps.append(uv.astype(np.float32))
        if i:
            nexts.append(np.arange(Kf))
            inls.append(np.ones(Kf, bool))
    T_b, O_b = Kf * (W - 1), 2 * Kf * (W - 1)
    built = vo._build_window_tracks(kps, nexts, inls, 0, W, T_b, O_b)
    (obs_cam, obs_trk, obs_uv, obs_valid, fc, fuv, lc, luv, trk_valid,
     kp_at_last) = built
    ba = vo._ba_window_fn(W, T_b, O_b)
    R_stack = jnp.asarray(np.stack([g[:3, :3] for g in gt]))
    t_stack = jnp.asarray(np.stack([g[:3, 3] for g in gt]))
    M, X, ok, costs = ba(R_stack, t_stack,
                         jnp.asarray(obs_cam, jnp.int32),
                         jnp.asarray(obs_trk, jnp.int32),
                         jnp.asarray(obs_uv), jnp.asarray(obs_valid),
                         jnp.asarray(fc, jnp.int32), jnp.asarray(fuv),
                         jnp.asarray(lc, jnp.int32), jnp.asarray(luv),
                         jnp.asarray(trk_valid), K)
    ok = np.asarray(ok)
    # the contaminated track (keypoint 0's track) is dropped; most clean
    # tracks survive
    bad_tid = int(kp_at_last[0])
    assert not ok[bad_tid]
    assert ok[:Kf].sum() >= Kf - 4


def test_rot_gate_values():
    """The write gate must pass translation-dominant windows and block a
    rotating window at the same span the full-scale circuit showed."""
    K = jnp.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1.0]],
                  jnp.float32)
    vo = VisualOdometry(K)
    assert vo.incremental_rot_gate == pytest.approx(0.2)

    def span(Ra, Rb):
        c = 0.5 * (np.trace(Rb @ Ra.T) - 1.0)
        return float(np.arccos(np.clip(c, -1.0, 1.0)))

    ang = 0.14  # orbit-like window: must write
    Rz = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]])
    assert span(np.eye(3), Rz) <= vo.incremental_rot_gate
    ang = 0.31  # circuit slow-yaw quarter: must gate
    Rz = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                   [-np.sin(ang), 0, np.cos(ang)]])
    assert span(np.eye(3), Rz) > vo.incremental_rot_gate
