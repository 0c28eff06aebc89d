#!/usr/bin/env python
"""Weak-scaling benchmark for distributed bundle adjustment
(BASELINE.json config 5: BA iters/s at N devices, weak-scaling efficiency).

Runs distributed BA on 1, 2, 4, 8 devices with the map size PROPORTIONAL
to the device count (weak scaling) and reports iters/s + efficiency.

Default: virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count=8)
so the collective path is exercised anywhere; on a pod slice the same code
runs over ICI.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"

import jax

# default to the 8-device virtual CPU mesh; set KTPU_SCALING_PLATFORM=tpu
# on a real pod slice to run the same code over ICI. (Must run before any
# device query — the axon sitecustomize pre-imports jax with 1 chip.)
if os.environ.get("KTPU_SCALING_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def run(D: int, P_per_dev: int = 64, C: int = 8, iters: int = 6):
    from kornia_tpu.geometry.liegroup import Se3
    from kornia_tpu.parallel.dist_ba import distributed_bundle_adjust
    from kornia_tpu.parallel.mesh import make_mesh
    from kornia_tpu.slam.ba import BAProblem, BAState, reprojection_residuals

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    P = D * P_per_dev
    angles = jnp.linspace(-0.3, 0.3, C)
    poses = Se3.exp(jnp.stack([jnp.zeros(C)] * 4 + [angles, jnp.zeros(C)], -1))
    poses = Se3(poses.r, poses.t + jnp.stack(
        [jnp.linspace(-1, 1, C), jnp.zeros(C), jnp.zeros(C)], -1))
    X = jax.random.normal(ks[0], (P, 3)) * 1.5 + jnp.array([0.0, 0, 6.0])
    K = jnp.array([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    cam_idx = jnp.concatenate(
        [jnp.repeat(jnp.arange(C), P_per_dev) for _ in range(D)])
    pt_local = jnp.concatenate(
        [jnp.tile(jnp.arange(P_per_dev), C) for _ in range(D)])
    pt_global = jnp.concatenate(
        [jnp.tile(jnp.arange(P_per_dev), C) + s * P_per_dev for s in range(D)])
    state_gt = BAState(poses, X)
    prob = BAProblem(cam_idx, pt_global, jnp.zeros((cam_idx.shape[0], 2)),
                     jnp.ones(cam_idx.shape[0], bool), K)
    uv = reprojection_residuals(state_gt, prob)
    uv = uv + 0.3 * jax.random.normal(ks[1], uv.shape)
    state0 = BAState(
        Se3((Se3.exp(0.02 * jax.random.normal(ks[2], (C, 6))).r * poses.r),
            poses.t + 0.05 * jax.random.normal(ks[3], (C, 3))),
        X + 0.1 * jax.random.normal(ks[4], (P, 3)))
    mesh = make_mesh((D, 1), devices=jax.devices()[:D])
    valid = jnp.ones(cam_idx.shape[0], bool)
    # warm up (compile)
    st, costs = distributed_bundle_adjust(
        mesh, state0, cam_idx, pt_local, uv, valid, K, C, num_iters=iters)
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    st, costs = distributed_bundle_adjust(
        mesh, state0, cam_idx, pt_local, uv, valid, K, C, num_iters=iters)
    jax.block_until_ready(costs)
    dt = time.perf_counter() - t0
    return iters / dt


def run_sparse(D: int, P_per_dev: int = 2500, C: int = 100, T: int = 6,
               iters: int = 4):
    """SfM-scale sparse-Schur path (VERDICT item 5): 100 cams, 2.5k points
    per device (20k at 8 devices), per-point track tables. Peak per-shard
    Schur memory = chunk*T^2*36*4 B (4.7 MB at chunk=512, T=6) + the
    replicated (C^2, 6, 6) accumulator (1.4 MB at C=100) — independent of
    the total map size, vs the dense path's O(C * P_local) coupling."""
    import numpy as np

    from kornia_tpu.geometry.liegroup import Se3
    from kornia_tpu.parallel.dist_ba import (build_sharded_point_tables,
                                             distributed_bundle_adjust_sparse)
    from kornia_tpu.parallel.mesh import make_mesh
    from kornia_tpu.slam.ba import BAProblem, BAState, reprojection_residuals

    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    P = D * P_per_dev
    angles = jnp.linspace(-0.3, 0.3, C)
    poses = Se3.exp(jnp.stack([jnp.zeros(C)] * 4 + [angles, jnp.zeros(C)], -1))
    poses = Se3(poses.r, poses.t + jnp.stack(
        [jnp.linspace(-1, 1, C), jnp.zeros(C), jnp.zeros(C)], -1))
    X = jax.random.normal(ks[0], (P, 3)) * 1.5 + jnp.array([0.0, 0, 6.0])
    K = jnp.array([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    start = jax.random.randint(ks[1], (P,), 0, max(C - T, 1))
    cam_idx = (start[:, None] + jnp.arange(T)[None]).reshape(-1)
    pt_idx = jnp.repeat(jnp.arange(P), T)
    state_gt = BAState(poses, X)
    prob = BAProblem(cam_idx, pt_idx, jnp.zeros((P * T, 2)),
                     jnp.ones(P * T, bool), K)
    uv = reprojection_residuals(state_gt, prob)
    uv = uv + 0.2 * jax.random.normal(ks[2], uv.shape)
    state0 = BAState(
        Se3((Se3.exp(0.02 * jax.random.normal(ks[3], (C, 6))).r * poses.r),
            poses.t + 0.05 * jax.random.normal(ks[4], (C, 3))),
        X + 0.1 * jax.random.normal(ks[5], (P, 3)))
    cams_t, uv_t, mask_t = build_sharded_point_tables(
        np.asarray(cam_idx), np.asarray(pt_idx), np.asarray(uv),
        np.ones(P * T, bool), P, max_track=T)
    mesh = make_mesh((D, 1), devices=jax.devices()[:D])
    argsets = (mesh, state0, jnp.asarray(cams_t), jnp.asarray(uv_t),
               jnp.asarray(mask_t), K, C)
    st, costs = distributed_bundle_adjust_sparse(
        *argsets, num_iters=iters, init_lambda=0.1)
    jax.block_until_ready(costs)
    t0 = time.perf_counter()
    st, costs = distributed_bundle_adjust_sparse(
        *argsets, num_iters=iters, init_lambda=0.1)
    jax.block_until_ready(costs)
    dt = time.perf_counter() - t0
    return iters / dt


def _make_circuit_graph(Npg: int, n_extra: int, seed: int = 0):
    """Circuit trajectory + random long-range edges (the dryrun's shape)."""
    from kornia_tpu.geometry.liegroup import Se3, So3
    from kornia_tpu.slam.posegraph import PoseGraph
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, Npg, endpoint=False)
    t_gt = np.stack([np.cos(ang) * 8, np.sin(ang) * 8, np.zeros(Npg)], -1)
    q_gt = np.stack([np.cos((ang + np.pi / 2) / 2), np.zeros(Npg),
                     np.zeros(Npg), np.sin((ang + np.pi / 2) / 2)], -1)
    gt = Se3(So3.from_wxyz(jnp.asarray(q_gt)), jnp.asarray(t_gt))
    extra = rng.integers(0, Npg, size=(n_extra, 2))
    extra = extra[np.abs(extra[:, 0] - extra[:, 1]) > Npg // 8]
    sp = np.concatenate([np.arange(Npg - 1), extra[:, 0]])
    dp = np.concatenate([np.arange(1, Npg), extra[:, 1]])
    Ti = Se3(So3.from_wxyz(gt.r.q.data[sp]), gt.t[sp])
    Tj = Se3(So3.from_wxyz(gt.r.q.data[dp]), gt.t[dp])
    E = sp.shape[0]
    graph = PoseGraph(jnp.asarray(sp), jnp.asarray(dp), Ti.inverse() * Tj,
                      jnp.ones(E), jnp.ones(E, bool))
    nz = 0.03 * jax.random.normal(jax.random.PRNGKey(9), (Npg, 6))
    dTn = Se3.exp(nz.at[0].set(0.0))
    p0 = Se3(dTn.r * gt.r,
             jnp.einsum("nij,nj->ni", dTn.r.matrix(), gt.t) + dTn.t)
    return sp, dp, graph, p0


def run_posegraph(D: int, Npg: int, n_extra: int, iters: int = 6):
    """Dense vs streaming distributed pose graph: cost per LM iteration.

    VERDICT r4 item 8: record BOTH paths at a size both hold, and the
    streaming path alone past the dense path's separator refusal point
    (dense = replicated (K*6)^2 Schur psum, max_separators=384)."""
    from jax.sharding import Mesh
    from kornia_tpu.parallel.dist_posegraph import (
        distributed_pose_graph, distributed_pose_graph_streaming,
        partition_pose_graph)
    sp, dp, graph, p0 = _make_circuit_graph(Npg, n_extra)
    mesh = Mesh(np.array(jax.devices()[:D]).reshape(D), ("data",))
    part = partition_pose_graph(sp, dp, np.ones(sp.shape[0], bool), Npg, D)
    out = {"num_separators": int(part.num_separators)}

    def timeit(fn, **kw):
        _, costs = fn(mesh, p0, graph, part, num_iters=2, **kw)
        jax.block_until_ready(costs)  # warm/compile
        t0 = time.perf_counter()
        _, costs = fn(mesh, p0, graph, part, num_iters=iters, **kw)
        jax.block_until_ready(costs)
        return iters / (time.perf_counter() - t0), float(costs[-1])

    try:
        ips, c = timeit(distributed_pose_graph)
        out["dense_iters_per_s"] = round(ips, 2)
        out["dense_final_cost"] = c
    except ValueError as e:
        out["dense_refused"] = str(e).split(";")[0]
    ips, c = timeit(distributed_pose_graph_streaming, cg_iters=64)
    out["streaming_iters_per_s"] = round(ips, 2)
    out["streaming_final_cost"] = c
    return out


def main():
    results = {}
    base = None
    for D in (1, 2, 4, 8):
        if D > jax.device_count():
            break
        ips = run(D)
        if base is None:
            base = ips
        results[f"ba_iters_per_s_{D}dev"] = round(ips, 2)
        results[f"weak_scaling_eff_{D}dev"] = round(ips / base, 3)
    base_s = None
    for D in (1, 2, 4, 8):
        if D > jax.device_count():
            break
        ips = run_sparse(D)
        if base_s is None:
            base_s = ips
        results[f"ba_sparse100c_iters_per_s_{D}dev"] = round(ips, 2)
        results[f"sparse_weak_scaling_eff_{D}dev"] = round(ips / base_s, 3)
        results[f"sparse_points_{D}dev"] = D * 2500
    D = min(8, jax.device_count())
    # both paths at a size the dense one holds (K ~ 90)
    results["posegraph_small"] = run_posegraph(D, 256, 64)
    # beyond the dense refusal point: >=512 separators, streaming only
    results["posegraph_large"] = run_posegraph(D, 2048, 400)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
