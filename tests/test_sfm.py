import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.geometry.scene import generate_scene
from kornia_tpu.metrics import ate_rmse
from kornia_tpu.slam.sfm import incremental_sfm


class TestIncrementalSfM:
    def test_reconstructs_synthetic_scene(self, key):
        s = generate_scene(key, num_views=4, num_points=48,
                           rotation_scale=0.15, translation_scale=0.4)
        obs = s["points2d"] + 0.3 * jax.random.normal(
            jax.random.fold_in(key, 1), s["points2d"].shape)
        vis = jnp.ones(obs.shape[:2], bool)
        res = incremental_sfm(obs, vis, s["K"][0], ba_iters=10)
        # reprojection at the noise floor
        assert res.final_rms < 0.8
        # camera centers recover up to Sim3
        V = 4
        C_est = np.stack([
            -np.asarray(res.poses.r.matrix()[i]).T
            @ np.asarray(res.poses.t[i]) for i in range(V)])
        C_gt = np.stack([
            -np.asarray(s["R"][i]).T @ np.asarray(s["t"][i][:, 0])
            for i in range(V)])
        ate = float(ate_rmse(jnp.asarray(C_est), jnp.asarray(C_gt),
                             with_scale=True))
        assert ate < 0.05

    def test_partial_visibility(self, key):
        s = generate_scene(key, num_views=4, num_points=48,
                           rotation_scale=0.1, translation_scale=0.3)
        obs = s["points2d"]
        vis = jax.random.uniform(jax.random.fold_in(key, 2),
                                 obs.shape[:2]) > 0.2
        vis = vis.at[0].set(True).at[1].set(True)  # init pair sees all
        res = incremental_sfm(obs, vis, s["K"][0], ba_iters=8)
        assert res.final_rms < 0.5
