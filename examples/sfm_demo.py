#!/usr/bin/env python
"""Incremental SfM on a synthetic multi-view scene.

Run: python examples/sfm_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.geometry.scene import generate_scene
from kornia_tpu.metrics import ate_rmse
from kornia_tpu.slam.sfm import incremental_sfm


def main():
    key = jax.random.PRNGKey(0)
    V = 5
    s = generate_scene(key, num_views=V, num_points=60,
                       rotation_scale=0.15, translation_scale=0.4)
    obs = s["points2d"] + 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), s["points2d"].shape)
    vis = jnp.ones(obs.shape[:2], bool)
    res = incremental_sfm(obs, vis, s["K"][0], ba_iters=12)
    C_est = np.stack([-np.asarray(res.poses.r.matrix()[i]).T
                      @ np.asarray(res.poses.t[i]) for i in range(V)])
    C_gt = np.stack([-np.asarray(s["R"][i]).T
                     @ np.asarray(s["t"][i][:, 0]) for i in range(V)])
    ate = float(ate_rmse(jnp.asarray(C_est), jnp.asarray(C_gt),
                         with_scale=True))
    print(f"views: {V}, points: {int(res.point_valid.sum())}")
    print(f"final reprojection RMS: {res.final_rms:.3f} px (noise 0.3 px)")
    print(f"camera-center ATE (Sim3-aligned): {ate:.4f}")


if __name__ == "__main__":
    main()
