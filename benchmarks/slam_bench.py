#!/usr/bin/env python
"""SLAM/SfM benchmark harness (north-star configs, BASELINE.json).

Measures on the current default device:
  1. two-view front end (detect + describe + match + essential RANSAC)
     frames/s on synthetic textured pairs,
  2. bundle-adjustment iterations/s for a C-camera, P-point window,
  3. VO trajectory ATE on a synthetic sequence with known ground truth.

Usage: python benchmarks/slam_bench.py [--size 256] [--features 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_two_view(size: int, num_features: int, iters: int = 5):
    from kornia_tpu.ops.filters import gaussian_blur2d
    from kornia_tpu.ops.warp import warp_perspective
    from kornia_tpu.slam import two_view_pose
    key = jax.random.PRNGKey(0)
    img0 = gaussian_blur2d(jax.random.uniform(key, (1, 1, size, size)), 3, 1.0)
    M = jnp.eye(3).at[0, 2].set(-4.0)[None]
    img1 = warp_perspective(img0, M, (size, size))
    K = jnp.array([[0.8 * size, 0.0, size / 2],
                   [0.0, 0.8 * size, size / 2], [0.0, 0.0, 1.0]])
    res = two_view_pose(img0, img1, K, num_features=num_features)
    jax.block_until_ready(res.R)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = two_view_pose(img0, img1, K, num_features=num_features,
                            key=jax.random.PRNGKey(i))
        jax.block_until_ready(res.R)
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return 1.0 / dt, int(res.num_inliers)


def bench_ba(C: int = 10, P: int = 200, iters: int = 20):
    from kornia_tpu.geometry.conversions import axis_angle_to_rotation_matrix
    from kornia_tpu.geometry.liegroup import Se3, So3
    from kornia_tpu.slam.ba import (BAProblem, BAState, bundle_adjust,
                                    reprojection_residuals)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    angles = jnp.linspace(-0.3, 0.3, C)
    poses = Se3.exp(jnp.stack([jnp.zeros(C)] * 4 + [angles, jnp.zeros(C)], -1))
    poses = Se3(poses.r, poses.t + jnp.stack(
        [jnp.linspace(-1, 1, C), jnp.zeros(C), jnp.zeros(C)], -1))
    X = jax.random.normal(ks[0], (P, 3)) * 1.5 + jnp.array([0.0, 0, 6.0])
    K = jnp.array([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    cam_idx = jnp.repeat(jnp.arange(C), P)
    pt_idx = jnp.tile(jnp.arange(P), C)
    state_gt = BAState(poses, X)
    prob0 = BAProblem(cam_idx, pt_idx, jnp.zeros((C * P, 2)),
                      jnp.ones(C * P, bool), K)
    uv = reprojection_residuals(state_gt, prob0)
    problem = BAProblem(cam_idx, pt_idx, uv + 0.3 * jax.random.normal(
        ks[1], uv.shape), jnp.ones(C * P, bool), K)
    state0 = BAState(
        Se3((Se3.exp(0.02 * jax.random.normal(ks[2], (C, 6))).r * poses.r),
            poses.t + 0.05 * jax.random.normal(ks[3], (C, 3))),
        X + 0.1 * jax.random.normal(ks[4], (P, 3)))
    # warm up
    st, costs = bundle_adjust(state0, problem, C, P, num_iters=iters)
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    st, costs = bundle_adjust(state0, problem, C, P, num_iters=iters)
    jax.block_until_ready(costs)
    dt = time.perf_counter() - t0
    final_rms = float(jnp.sqrt(jnp.mean(jnp.sum(
        reprojection_residuals(st, problem) ** 2, -1))))
    return iters / dt, final_rms


def bench_vo_ate(size: int = 128, n_frames: int = 5):
    from kornia_tpu.metrics import ate_rmse
    from kornia_tpu.ops.filters import gaussian_blur2d
    from kornia_tpu.ops.warp import warp_perspective
    from kornia_tpu.slam.vo import VisualOdometry
    key = jax.random.PRNGKey(0)
    base = gaussian_blur2d(jax.random.uniform(key, (1, 1, size, size)), 3, 1.0)
    frames = [warp_perspective(base, jnp.eye(3).at[0, 2].set(-3.0 * i)[None],
                               (size, size)) for i in range(n_frames)]
    K = jnp.array([[0.8 * size, 0.0, size / 2],
                   [0.0, 0.8 * size, size / 2], [0.0, 0.0, 1.0]])
    vo = VisualOdometry(K, num_features=384)
    t0 = time.perf_counter()
    res = vo.run(frames)
    dt = time.perf_counter() - t0
    centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in res.poses])
    # ground truth: unit steps along +x (monocular scale normalized)
    gt = np.stack([np.array([i, 0.0, 0.0]) for i in range(n_frames)])
    ate = float(ate_rmse(jnp.asarray(centers), jnp.asarray(gt),
                         with_scale=True))
    return (n_frames - 1) / dt, ate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--features", type=int, default=512)
    args = ap.parse_args()

    fps, inl = bench_two_view(args.size, args.features)
    ba_ips, ba_rms = bench_ba()
    vo_fps, ate = bench_vo_ate()
    print(json.dumps({
        "two_view_fps": round(fps, 2),
        "two_view_inliers": inl,
        "ba_iters_per_s": round(ba_ips, 1),
        "ba_final_rms_px": round(ba_rms, 3),
        "vo_fps": round(vo_fps, 2),
        "vo_ate_rmse": round(ate, 4),
    }))


if __name__ == "__main__":
    main()
