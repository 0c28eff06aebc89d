#!/usr/bin/env python
"""Distributed bundle adjustment over a device mesh (8 virtual CPU
devices by default; the same code runs over ICI on a pod slice).

Run: python examples/distributed_ba_demo.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if os.environ.get("KTPU_DEMO_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from kornia_tpu.geometry.liegroup import Se3
from kornia_tpu.parallel.dist_ba import distributed_bundle_adjust
from kornia_tpu.parallel.mesh import make_mesh
from kornia_tpu.slam.ba import BAProblem, BAState, reprojection_residuals


def main():
    key = jax.random.PRNGKey(0)
    D = min(8, jax.device_count())
    C, P_local = 6, 32
    P = D * P_local
    ks = jax.random.split(key, 5)
    angles = jnp.linspace(-0.3, 0.3, C)
    poses = Se3.exp(jnp.stack([jnp.zeros(C)] * 4 + [angles, jnp.zeros(C)], -1))
    poses = Se3(poses.r, poses.t + jnp.stack(
        [jnp.linspace(-1, 1, C), jnp.zeros(C), jnp.zeros(C)], -1))
    X = jax.random.normal(ks[0], (P, 3)) * 1.5 + jnp.array([0.0, 0, 6.0])
    K = jnp.array([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    cam_idx = jnp.concatenate(
        [jnp.repeat(jnp.arange(C), P_local) for _ in range(D)])
    pt_local = jnp.concatenate(
        [jnp.tile(jnp.arange(P_local), C) for _ in range(D)])
    pt_global = jnp.concatenate(
        [jnp.tile(jnp.arange(P_local), C) + s * P_local for s in range(D)])
    gt = BAState(poses, X)
    prob = BAProblem(cam_idx, pt_global, jnp.zeros((cam_idx.shape[0], 2)),
                     jnp.ones(cam_idx.shape[0], bool), K)
    uv = reprojection_residuals(gt, prob) + 0.3 * jax.random.normal(
        ks[1], (cam_idx.shape[0], 2))
    state0 = BAState(
        Se3((Se3.exp(0.03 * jax.random.normal(ks[2], (C, 6))).r * poses.r),
            poses.t + 0.1 * jax.random.normal(ks[3], (C, 3))),
        X + 0.2 * jax.random.normal(ks[4], (P, 3)))
    mesh = make_mesh((D, 1), devices=jax.devices()[:D])
    state, costs = distributed_bundle_adjust(
        mesh, state0, cam_idx, pt_local, uv,
        jnp.ones(cam_idx.shape[0], bool), K, C, num_iters=10)
    prob_full = BAProblem(cam_idx, pt_global, uv,
                          jnp.ones(cam_idx.shape[0], bool), K)
    r = reprojection_residuals(state, prob_full)
    print(f"devices: {D}, final reprojection RMS: "
          f"{float(jnp.sqrt(jnp.mean(jnp.sum(r**2, -1)))):.3f} px")
    print("costs:", np.asarray(costs).round(1))


if __name__ == "__main__":
    main()
