"""Loop closure end-to-end (VERDICT r2 item 2): a rendered circuit that
returns to its start; closure must detect the revisit, verify it with a
metric PnP edge, and measurably cut ATE vs odometry-only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.metrics.metrics import ate_rmse
from kornia_tpu.slam.loop_closure import (close_loops,
                                          detect_loop_candidates,
                                          global_descriptors)
from kornia_tpu.slam.vo import VisualOdometry
from kornia_tpu.utils.render import (loop_trajectory, make_room_scene,
                                     render_sequence)


def _cam_centers(poses):
    return np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])


@pytest.fixture(scope="module")
def loop_run():
    H, W = 240, 320
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    scene = make_room_scene(tex_size=512)
    traj = loop_trajectory(48, rx=1.2, rz=2.4)
    frames, _ = render_sequence(scene, K, traj, H, W)
    vo = VisualOdometry(K, num_features=512, ransac_iters=8,
                        ransac_batch=512)
    res = vo.run(frames, refine=True)
    return vo, res, traj, K


def test_place_recognition_finds_the_revisit(loop_run):
    vo, res, traj, K = loop_run
    gdesc = global_descriptors(vo.frame_cache)
    cands = detect_loop_candidates(gdesc, min_separation=12, sim_th=0.75)
    assert cands, "no loop candidate detected on a closed circuit"
    # the circuit's last frames revisit the first ones
    assert any(i >= len(traj) - 6 and j <= 5 for i, j, _ in cands), cands


def test_closure_never_hurts_well_tracked(loop_run):
    vo, res, traj, K = loop_run
    gt_c = _cam_centers(traj)
    f = float(np.asarray(K)[0, 0])
    closed, edges = close_loops(vo.frame_cache, res.poses, np.asarray(K),
                                min_separation=12, sim_th=0.75,
                                inl_th=1.5 / f, loop_weight=10.0,
                                pg_iters=40)
    assert edges, "no loop edge accepted"
    assert edges[0].i - edges[0].j >= 12
    ate_open = float(ate_rmse(jnp.asarray(_cam_centers(res.poses)),
                              jnp.asarray(gt_c), with_scale=True))
    ate_closed = float(ate_rmse(jnp.asarray(_cam_centers(closed)),
                                jnp.asarray(gt_c), with_scale=True))
    # on this circuit VO itself is at ~1% ATE — a consistent loop edge
    # must not meaningfully disturb an already-correct trajectory
    # (5 cm absolute tolerance on an 11.7 m path = 0.4 %)
    assert ate_closed < ate_open + 0.05, (ate_open, ate_closed)


def test_closure_cuts_injected_drift(loop_run):
    """The measurable-cut assertion, made deterministic: corrupt the
    odometry chain with systematic per-step rotation + scale drift (what
    long degraded sequences exhibit), keep the cached maps, and require
    the verified loop edge + pose graph to recover most of it."""
    vo, res, traj, K = loop_run
    gt_c = _cam_centers(traj)
    f = float(np.asarray(K)[0, 0])

    ang = np.deg2rad(1.0)
    c, s = np.cos(ang), np.sin(ang)
    D = np.eye(4)
    D[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    drifted = [res.poses[0].copy()]
    for k in range(1, len(res.poses)):
        rel = res.poses[k] @ np.linalg.inv(res.poses[k - 1])
        rel = rel.copy()
        rel[:3, 3] *= 1.03  # scale drift
        drifted.append((D @ rel) @ drifted[-1])

    ate_drift = float(ate_rmse(jnp.asarray(_cam_centers(drifted)),
                               jnp.asarray(gt_c), with_scale=True))
    assert ate_drift > 0.3, "drift injection too weak to test closure"

    closed, edges = close_loops(vo.frame_cache, drifted, np.asarray(K),
                                min_separation=12, sim_th=0.75,
                                inl_th=1.5 / f, loop_weight=10.0,
                                pg_iters=40)
    assert edges, "no loop edge accepted on the drifted trajectory"
    ate_closed = float(ate_rmse(jnp.asarray(_cam_centers(closed)),
                                jnp.asarray(gt_c), with_scale=True))
    # the achievable correction is bounded: all 47 odometry edge
    # MEASUREMENTS carry the injected drift and outvote the 2 correct
    # loop edges at the graph optimum (weight sweep measured 0.74-0.76x
    # across loop weights 10-200); require a clear, reproducible cut
    assert ate_closed < 0.85 * ate_drift, (ate_drift, ate_closed)


def test_no_loop_no_change():
    """A non-revisiting sequence must pass through unchanged."""
    from kornia_tpu.utils.render import walk_trajectory

    H, W = 120, 160
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    scene = make_room_scene(tex_size=128)
    traj = walk_trajectory(12)
    frames, _ = render_sequence(scene, K, traj, H, W)
    vo = VisualOdometry(K, num_features=256, ransac_iters=6,
                        ransac_batch=512)
    res = vo.run(frames, refine=False)
    closed, edges = close_loops(vo.frame_cache, res.poses, np.asarray(K),
                                min_separation=10, sim_th=0.97)
    assert not edges
    for a, b in zip(closed, res.poses):
        np.testing.assert_allclose(a, b)
