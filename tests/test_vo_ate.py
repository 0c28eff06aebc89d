"""North-star trajectory regression: VO ATE on a rendered GT sequence.

The reference pipeline bound on the same data is measured by
benchmarks/ate_bench.py (reference kornia 5-point RANSAC chained with GT
step scales): 2.8% of trajectory length on the walk sequence. Our chained
pipeline must stay under that bound and BA refinement must come in well
under it (reference: kornia/geometry/ransac.py:42 +
kornia/geometry/epipolar/essential.py:748 define the pipeline compared
against).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.metrics.metrics import ate_rmse
from kornia_tpu.slam.vo import VisualOdometry
from kornia_tpu.utils.render import (make_room_scene, render_sequence,
                                     walk_trajectory)

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


def _cam_centers(poses):
    return np.stack([-p[:3, :3].T @ p[:3, 3] for p in poses])


@pytest.fixture(scope="module")
def rendered_walk():
    H, W = 168, 224
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    scene = make_room_scene(tex_size=192)
    traj = walk_trajectory(7, depth=10.0)
    frames, _depths = render_sequence(scene, K, traj, H, W)
    return K, traj, frames


def test_vo_ate_rendered_walk(rendered_walk):
    K, traj, frames = rendered_walk
    gt_c = _cam_centers(traj)
    L = float(np.sum(np.linalg.norm(np.diff(gt_c, axis=0), axis=1)))

    vo = VisualOdometry(K, num_features=384, ransac_iters=6,
                        ransac_batch=512)
    res = vo.run(frames, refine=True)
    assert len(res.poses) == len(frames)
    est_c = _cam_centers(res.poses)
    assert np.all(np.isfinite(est_c))
    ate = float(ate_rmse(jnp.asarray(est_c), jnp.asarray(gt_c),
                         with_scale=True))
    # reference-pipeline bound on this scene class is 2.8% of length;
    # refined VO must be comfortably below it
    assert ate < 0.02 * L, f"ATE {ate:.4f} over {L:.2f}-length trajectory"


def test_vo_refinement_not_worse(rendered_walk):
    K, traj, frames = rendered_walk
    gt_c = _cam_centers(traj)
    vo = VisualOdometry(K, num_features=384, ransac_iters=6,
                        ransac_batch=512)
    a = {}
    for refine in (False, True):
        res = vo.run(frames, refine=refine)
        a[refine] = float(ate_rmse(
            jnp.asarray(_cam_centers(res.poses)), jnp.asarray(gt_c),
            with_scale=True))
    # BA must not degrade the chained estimate (allow 20% noise headroom)
    assert a[True] <= a[False] * 1.2 + 1e-3, a
