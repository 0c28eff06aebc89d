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


def test_closure_cuts_ate(loop_run):
    vo, res, traj, K = loop_run
    gt_c = _cam_centers(traj)
    f = float(np.asarray(K)[0, 0])

    closed, edges = close_loops(vo.frame_cache, res.poses, np.asarray(K),
                                min_separation=12, sim_th=0.75,
                                min_inliers=30, inl_th=1.5 / f,
                                loop_weight=10.0, pg_iters=40)
    assert edges, "no loop edge accepted"
    e = edges[0]
    assert e.i - e.j >= 12

    ate_open = float(ate_rmse(jnp.asarray(_cam_centers(res.poses)),
                              jnp.asarray(gt_c), with_scale=True))
    ate_closed = float(ate_rmse(jnp.asarray(_cam_centers(closed)),
                                jnp.asarray(gt_c), with_scale=True))
    # closure must help, and clearly so (measured: 0.61 -> 0.44)
    assert ate_closed < ate_open * 0.9, (ate_open, ate_closed)


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
