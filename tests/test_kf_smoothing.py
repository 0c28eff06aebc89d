"""Unit tests for slam/loop_closure.py::smooth_keyframe_graph on fully
synthetic frame caches (no rendering, no detector): PnP skip edges over a
noised keyframe chain must pull poses back toward ground truth, and the
no-verified-edge path must leave poses untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.slam.loop_closure import smooth_keyframe_graph, verify_loop


H, W = 192, 256
K = np.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
              [0.0, 0.0, 1.0]], np.float32)


def _make_chain(n=6, kf=96, noise=0.0, seed=0):
    """n keyframes translating along x, all observing the same 3D cloud.

    Returns (frame_cache, gt_poses). Descriptors are shared across frames
    (row i of a fixed random matrix), so mutual-SNN matches keypoint i to
    keypoint i exactly; depths are the exact per-frame z — verify_loop's
    PnP then has noiseless 2D-3D support and the graph's only error
    source is the injected pose noise.
    """
    rng = np.random.default_rng(seed)
    Xw = rng.uniform(-1.5, 1.5, (kf, 3)).astype(np.float32)
    Xw[:, 2] += 6.0
    desc = rng.normal(0, 1, (kf, 64)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    cache, gt = [], []
    for i in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-0.35 * i, 0.0, 0.0]  # world→cam: camera at +x
        gt.append(T.astype(np.float64))
        Xc = Xw @ T[:3, :3].T + T[:3, 3]
        uv = (Xc @ K.T)
        uv = uv[:, :2] / uv[:, 2:]
        inside = ((uv[:, 0] >= 0) & (uv[:, 0] < W)
                  & (uv[:, 1] >= 0) & (uv[:, 1] < H))
        cache.append({"kp": uv.astype(np.float32),
                      "desc": desc,
                      "valid": inside,
                      "depth": np.where(inside, Xc[:, 2], 0.0)
                      .astype(np.float32)})
    return cache, gt


def test_verify_loop_recovers_synthetic_relative_pose():
    cache, gt = _make_chain()
    T_rel, n_inl, n_map = verify_loop(cache, gt, 3, 0, K,
                                      inl_th=1.5 / K[0, 0])
    assert n_inl >= 30, n_inl
    expect = np.linalg.inv(gt[0]) @ gt[3]
    np.testing.assert_allclose(T_rel[:3, 3], expect[:3, 3], atol=5e-2)
    np.testing.assert_allclose(T_rel[:3, :3], expect[:3, :3], atol=2e-2)


def test_smoothing_pulls_noised_chain_toward_gt():
    cache, gt = _make_chain()
    rng = np.random.default_rng(1)
    noised = [p.copy() for p in gt]
    for i in range(1, len(gt)):
        noised[i][:3, 3] += rng.normal(0, 0.05, 3)

    def err(poses):
        return sum(np.linalg.norm(p[:3, 3] - g[:3, 3])
                   for p, g in zip(poses, gt))

    out = smooth_keyframe_graph(cache, noised, list(range(len(gt))), K,
                                skips=(2, 3), min_inliers=20, pg_iters=60,
                                inl_th=1.5 / K[0, 0])
    assert err(out) < 0.7 * err(noised), (err(noised), err(out))


def test_smoothing_no_edges_is_identity():
    cache, gt = _make_chain()
    for f in cache:
        f["depth"][:] = 0.0  # no maps -> no verified skip edge
    noised = [p.copy() for p in gt]
    noised[2][:3, 3] += 0.1
    out = smooth_keyframe_graph(cache, noised, list(range(len(gt))), K,
                                skips=(2,), inl_th=1.5 / K[0, 0])
    for a, b in zip(out, noised):
        np.testing.assert_array_equal(a, b)


def test_smoothing_short_chain_passthrough():
    cache, gt = _make_chain(n=2)
    out = smooth_keyframe_graph(cache, gt, [0, 1], K)
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], gt[0])
