"""Sparse-Schur distributed BA over the 8-device virtual mesh.

Validates VERDICT item 5: the dense (C, P_local, 6, 3) coupling block is
replaced by per-point track tables + chunked camera-pair assembly, so the
path scales to 100 cams / 20k points (smoke-tested here at the full size).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.geometry.liegroup import Se3
from kornia_tpu.parallel.dist_ba import (
    build_sharded_point_tables,
    distributed_bundle_adjust_sparse,
)
from kornia_tpu.parallel.mesh import make_mesh
from kornia_tpu.slam.ba import BAProblem, BAState, reprojection_residuals


def _make_problem(key, C, P, D, noise=0.3, jitter=0.05, T=None):
    """Synthetic map: every point seen by `T` consecutive cameras."""
    ks = jax.random.split(key, 6)
    T = T or min(C, 6)
    angles = jnp.linspace(-0.3, 0.3, C)
    poses = Se3.exp(jnp.stack([jnp.zeros(C)] * 4 + [angles, jnp.zeros(C)], -1))
    poses = Se3(poses.r, poses.t + jnp.stack(
        [jnp.linspace(-1, 1, C), jnp.zeros(C), jnp.zeros(C)], -1))
    X = jax.random.normal(ks[0], (P, 3)) * 1.5 + jnp.array([0.0, 0, 6.0])
    K = jnp.array([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    # each point observed by a window of T cameras starting at a random cam
    start = jax.random.randint(ks[1], (P,), 0, max(C - T, 1))
    cam_idx = (start[:, None] + jnp.arange(T)[None]).reshape(-1)  # (P*T,)
    pt_idx = jnp.repeat(jnp.arange(P), T)
    state_gt = BAState(poses, X)
    prob = BAProblem(cam_idx, pt_idx, jnp.zeros((P * T, 2)),
                     jnp.ones(P * T, bool), K)
    uv = reprojection_residuals(state_gt, prob)
    uv = uv + noise * jax.random.normal(ks[2], uv.shape)
    state0 = BAState(
        Se3((Se3.exp(0.02 * jax.random.normal(ks[3], (C, 6))).r * poses.r),
            poses.t + jitter * jax.random.normal(ks[4], (C, 3))),
        X + 2 * jitter * jax.random.normal(ks[5], (P, 3)))
    cams_t, uv_t, mask_t = build_sharded_point_tables(
        np.asarray(cam_idx), np.asarray(pt_idx), np.asarray(uv),
        np.ones(P * T, bool), P)
    return state_gt, state0, cams_t, uv_t, mask_t, K, prob, uv


class TestDistBASparse:
    def test_converges_and_matches_single_device(self):
        D, C, P = 8, 10, 256
        key = jax.random.PRNGKey(7)
        (state_gt, state0, cams_t, uv_t, mask_t, K, prob, uv) = \
            _make_problem(key, C, P, D, noise=0.1)
        mesh = make_mesh((D, 1), devices=jax.devices()[:D])
        st, costs = distributed_bundle_adjust_sparse(
            mesh, state0, jnp.asarray(cams_t), jnp.asarray(uv_t),
            jnp.asarray(mask_t), K, C, num_iters=10, point_chunk=16)
        costs = np.asarray(costs)
        assert np.all(np.isfinite(costs))
        assert costs[-1] < 0.25 * costs[0]

        # single-device sparse reference on the SAME problem
        from kornia_tpu.slam.ba_sparse import (build_point_tables,
                                               bundle_adjust_sparse)
        prob_uv = BAProblem(prob.cam_idx, prob.pt_idx, uv, prob.valid, K)
        obs_idx, obs_mask = build_point_tables(
            np.asarray(prob.cam_idx), np.asarray(prob.pt_idx),
            np.ones(prob.cam_idx.shape[0], bool), P)
        st_ref, costs_ref = bundle_adjust_sparse(
            state0, prob_uv, jnp.asarray(obs_idx), jnp.asarray(obs_mask),
            C, P, num_iters=10)
        # identical LM schedule on the same normal equations -> same costs
        np.testing.assert_allclose(costs[-1], np.asarray(costs_ref)[-1],
                                   rtol=2e-3)
        # f32 accumulation order differs across shards, so the LM
        # trajectories drift slightly; both land on the same optimum.
        np.testing.assert_allclose(np.asarray(st.points),
                                   np.asarray(st_ref.points), atol=1e-1)

    def test_sfm_scale_smoke(self):
        """100 cams / 20k points / 120k observations on the 8-device mesh.

        The dense path would need C*P_local*18 floats = 100*2500*18*4 =
        18 MB *per Schur einsum operand* with an O(C^2 P) contraction; the
        sparse path peaks at chunk*T^2*36*4 = 4.7 MB regardless of P.
        """
        D, C, P = 8, 100, 20000
        key = jax.random.PRNGKey(3)
        (state_gt, state0, cams_t, uv_t, mask_t, K, _, _) = \
            _make_problem(key, C, P, D, noise=0.2)
        mesh = make_mesh((D, 1), devices=jax.devices()[:D])
        st, costs = distributed_bundle_adjust_sparse(
            mesh, state0, jnp.asarray(cams_t), jnp.asarray(uv_t),
            jnp.asarray(mask_t), K, C, num_iters=3, point_chunk=512,
            init_lambda=0.1)
        costs = np.asarray(costs)
        assert np.all(np.isfinite(costs))
        assert costs[-1] < costs[0]
        assert np.isfinite(np.asarray(st.points)).all()
