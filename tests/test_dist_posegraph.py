"""Submap-sharded distributed pose graph vs the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from kornia_tpu.geometry.liegroup import Se3, So3
from kornia_tpu.parallel.dist_posegraph import (distributed_pose_graph,
                                                partition_pose_graph)
from kornia_tpu.slam.posegraph import PoseGraph, optimize_pose_graph


def _loop_graph(N=48, noise_scale=0.05, seed=1):
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    t_gt = np.stack([np.cos(angles) * 5, np.sin(angles) * 5,
                     np.zeros(N)], -1)
    yaw = angles + np.pi / 2
    q_gt = np.stack([np.cos(yaw / 2), np.zeros(N), np.zeros(N),
                     np.sin(yaw / 2)], -1)
    poses_gt = Se3(So3.from_wxyz(jnp.asarray(q_gt)), jnp.asarray(t_gt))
    src = np.array(list(range(N - 1)) + [0, 10, 20])
    dst = np.array(list(range(1, N)) + [N - 1, 30, 40])
    Ti = Se3(So3.from_wxyz(poses_gt.r.q.data[src]), poses_gt.t[src])
    Tj = Se3(So3.from_wxyz(poses_gt.r.q.data[dst]), poses_gt.t[dst])
    E = src.shape[0]
    graph = PoseGraph(jnp.asarray(src), jnp.asarray(dst),
                      Ti.inverse() * Tj, jnp.ones(E), jnp.ones(E, bool))
    noise = noise_scale * jax.random.normal(jax.random.PRNGKey(seed), (N, 6))
    noise = noise.at[0].set(0.0)
    dT = Se3.exp(noise)
    poses0 = Se3(dT.r * poses_gt.r,
                 jnp.einsum("nij,nj->ni", dT.r.matrix(), poses_gt.t) + dT.t)
    return poses0, graph, src, dst, N, E


def test_partition_covers_all_poses_and_edges():
    _p, _g, src, dst, N, E = _loop_graph()
    part = partition_pose_graph(src, dst, np.ones(E, bool), N, 4)
    covered = set(part.sep_ids.tolist())
    covered |= set(part.int_ids[part.int_valid].tolist())
    assert covered == set(range(N))
    assert 0 in part.sep_ids.tolist()  # gauge pose is a separator
    # every non-sep-sep edge appears exactly once; sep-sep D times at 1/D
    w_by_edge = {}
    for s in range(4):
        for i in range(part.src.shape[1]):
            if part.edge_w[s, i] > 0:
                e = int(part.edge_id[s, i])
                w_by_edge[e] = w_by_edge.get(e, 0.0) + part.edge_w[s, i]
    assert set(w_by_edge) == set(range(E))
    np.testing.assert_allclose(list(w_by_edge.values()), 1.0, atol=1e-6)


def test_distributed_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    poses0, graph, src, dst, N, E = _loop_graph()
    ps, cs = optimize_pose_graph(poses0, graph, num_iters=12)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    part = partition_pose_graph(src, dst, np.ones(E, bool), N, 8)
    pd, cd = distributed_pose_graph(mesh, poses0, graph, part, num_iters=12)
    assert float(cd[-1]) < 1e-9
    assert float(jnp.abs(pd.t - ps.t).max()) < 1e-4
    # rotation agreement up to quaternion sign
    qs, qd = np.asarray(ps.r.q.data), np.asarray(pd.r.q.data)
    dots = np.abs(np.sum(qs * qd, -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_distributed_closes_large_drift():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    poses0, graph, src, dst, N, E = _loop_graph(noise_scale=0.15, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    part = partition_pose_graph(src, dst, np.ones(E, bool), N, 8)
    pd, cd = distributed_pose_graph(mesh, poses0, graph, part, num_iters=15)
    assert float(cd[-1]) < 1e-6 * float(cd[0])
