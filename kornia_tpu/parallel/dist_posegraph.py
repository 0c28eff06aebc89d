"""Distributed pose-graph optimization via submap sharding (NEW — ROADMAP
north-star; no reference counterpart).

Nested-dissection layout (DCN-aware: the only cross-device traffic is the
separator system):

  * poses are partitioned into D SUBMAPS (one per device on the ``data``
    axis); poses touched by cross-submap edges are SEPARATORS, replicated
    on every device. Each device's local pose table is
    [K separators; Ni own internals].
  * every device assembles the normal equations of ITS edges only
    (intra-submap + its separator couplings; separator-separator edges are
    replicated with weight 1/D so the psum reconstructs them exactly),
  * internal poses are eliminated LOCALLY (per-shard dense Cholesky of the
    (Ni*6)^2 internal block — embarrassingly parallel),
  * ONE psum reduces the (K*6)^2 separator Schur system — the only
    collective; every device solves it redundantly and back-substitutes
    its internals with zero further communication.

Complexity per LM iteration: O((Ni*6)^3 / shard) + O((K*6)^3 replicated)
+ one psum of (K*6)^2 — versus O((N*6)^3) for the dense single-device
solver in slam/posegraph.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry.liegroup import Se3, So3
from ..losses.robust import huber_weight
from ..slam.posegraph import PoseGraph, _edge_residual

__all__ = ["partition_pose_graph", "distributed_pose_graph",
           "distributed_pose_graph_streaming", "PartitionedGraph"]


@dataclasses.dataclass
class PartitionedGraph:
    """Host-built static partition of a pose graph for D shards.

    sep_ids (K,): global pose ids of separators (pose 0 always included
    for gauge fixing). int_ids (D, Ni): global ids of each shard's
    internal poses (padded; int_valid marks real slots). Edges are stored
    per shard with LOCAL endpoint ids indexing [K seps; Ni internals];
    sep-sep edges are replicated into every shard with weight 1/D.
    """

    sep_ids: np.ndarray      # (K,)
    int_ids: np.ndarray      # (D, Ni)
    int_valid: np.ndarray    # (D, Ni)
    src: np.ndarray          # (D, E) local ids in [0, K + Ni)
    dst: np.ndarray          # (D, E)
    edge_id: np.ndarray      # (D, E) index into the original edge arrays
    edge_w: np.ndarray       # (D, E) weight multiplier (1 or 1/D), 0 = pad
    num_separators: int
    num_internal: int


def partition_pose_graph(src: np.ndarray, dst: np.ndarray,
                         valid: np.ndarray, num_poses: int, num_shards: int,
                         submap_of: Optional[np.ndarray] = None
                         ) -> PartitionedGraph:
    """Host-side: split poses into D submaps and classify edges.

    submap_of: (N,) shard id per pose; default = contiguous blocks (the
    natural layout for a trajectory: consecutive keyframes share a shard).
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    v = np.asarray(valid).astype(bool)
    N, D = num_poses, num_shards
    if submap_of is None:
        submap_of = np.minimum(np.arange(N) * D // max(N, 1), D - 1)
    submap_of = np.asarray(submap_of)

    cross = v & (submap_of[src] != submap_of[dst])
    sep_set = set(src[cross].tolist()) | set(dst[cross].tolist()) | {0}
    sep_ids = np.asarray(sorted(sep_set), np.int32)
    K = len(sep_ids)
    sep_rank = {int(g): i for i, g in enumerate(sep_ids)}

    int_lists = [[] for _ in range(D)]
    for p in range(N):
        if p not in sep_set:
            int_lists[submap_of[p]].append(p)
    Ni = max((len(l) for l in int_lists), default=1) or 1
    int_ids = np.zeros((D, Ni), np.int32)
    int_valid = np.zeros((D, Ni), bool)
    int_rank: Dict[int, Tuple[int, int]] = {}
    for s, l in enumerate(int_lists):
        for i, g in enumerate(l):
            int_ids[s, i] = g
            int_valid[s, i] = True
            int_rank[g] = (s, i)

    def local_id(g: int, shard: int) -> int:
        if g in sep_rank:
            return sep_rank[g]
        s, i = int_rank[g]
        assert s == shard
        return K + i

    e_lists = [[] for _ in range(D)]  # (edge_id, src_loc, dst_loc, w)
    for e in range(src.shape[0]):
        if not v[e]:
            continue
        a, b = int(src[e]), int(dst[e])
        a_sep, b_sep = a in sep_rank, b in sep_rank
        if a_sep and b_sep:
            for s in range(D):  # replicated, 1/D weight
                e_lists[s].append((e, sep_rank[a], sep_rank[b], 1.0 / D))
        else:
            s = int(submap_of[a]) if not a_sep else int(submap_of[b])
            e_lists[s].append((e, local_id(a, s), local_id(b, s), 1.0))

    E = max((len(l) for l in e_lists), default=1) or 1
    ed_src = np.zeros((D, E), np.int32)
    ed_dst = np.zeros((D, E), np.int32)
    ed_id = np.zeros((D, E), np.int32)
    ed_w = np.zeros((D, E), np.float32)
    for s, l in enumerate(e_lists):
        for i, (e, a, b, w) in enumerate(l):
            ed_src[s, i], ed_dst[s, i], ed_id[s, i], ed_w[s, i] = a, b, e, w
    return PartitionedGraph(sep_ids, int_ids, int_valid, ed_src, ed_dst,
                            ed_id, ed_w, K, Ni)


def distributed_pose_graph(
    mesh: Mesh,
    poses: Se3,
    graph: PoseGraph,
    part: PartitionedGraph,
    num_iters: int = 10,
    init_lambda: float = 1e-4,
    robust_delta: float = 1.0,
    fix_first: bool = True,
    max_separators: int = 384,
) -> Tuple[Se3, jax.Array]:
    """LM over the submap-sharded pose graph. Returns (poses (N,), costs).

    poses: (N,) Se3 in GLOBAL order; the partition layout is internal.

    Refuses graphs whose separator count exceeds `max_separators`: this
    path materializes and psums the FULL (K*6)^2 separator Schur
    complement on every device every iteration — at K=512 that is a
    37.7 MB replicated f32 block, past v5e VMEM (~16 MB per core), so
    the executable degrades to HBM-spilled matmuls and O(K^2) ICI/DCN
    traffic, defeating the design. Use
    `distributed_pose_graph_streaming` (block-CSR + PCG, O(K) memory
    and O(K) psum per matvec) past that scale.
    """
    K, Ni = part.num_separators, part.num_internal
    if K > max_separators:
        raise ValueError(
            f"distributed_pose_graph: {K} separators > max_separators="
            f"{max_separators}; the dense (K*6)^2 Schur psum "
            f"({(K * 6) ** 2 * 4 / 2 ** 20:.1f} MB replicated per device "
            "per iteration) does not fit the VMEM design budget — use "
            "distributed_pose_graph_streaming for separator counts at "
            "this scale.")
    D = mesh.shape["data"]
    N = poses.t.shape[0]

    sep_ids = jnp.asarray(part.sep_ids)
    int_ids = jnp.asarray(part.int_ids)          # (D, Ni)
    int_valid = jnp.asarray(part.int_valid)      # (D, Ni)
    e_src = jnp.asarray(part.src).reshape(D * part.src.shape[1])
    e_dst = jnp.asarray(part.dst).reshape(-1)
    e_meas_q = graph.meas.r.q.data[jnp.asarray(part.edge_id).reshape(-1)]
    e_meas_t = graph.meas.t[jnp.asarray(part.edge_id).reshape(-1)]
    e_w = (jnp.asarray(part.edge_w).reshape(-1)
           * graph.weight[jnp.asarray(part.edge_id).reshape(-1)])
    int_valid_flat = int_valid.reshape(D * Ni)

    Lloc = K + Ni

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P("data"), P()),
        check_vma=False)
    def lm_iter(sep_q, sep_t, int_q, int_t, src, dst, mq, mt, w, ivalid,
                lam):
        lam_s = lam[0]
        q_all = jnp.concatenate([sep_q, int_q], 0)   # (K + Ni, 4)
        t_all = jnp.concatenate([sep_t, int_t], 0)
        E = src.shape[0]
        zeros6 = jnp.zeros((E, 6))

        def res_jac(z6a, z6b, a, b, c, d, e, f):
            r = _edge_residual(z6a, z6b, a, b, c, d, e, f)
            Ji = jax.jacfwd(lambda z: _edge_residual(
                z, z6b, a, b, c, d, e, f))(z6a)
            Jj = jax.jacfwd(lambda z: _edge_residual(
                z6a, z, a, b, c, d, e, f))(z6b)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(res_jac)(
            zeros6, zeros6, q_all[src], t_all[src], q_all[dst], t_all[dst],
            mq, mt)
        r2 = jnp.sum(r * r, -1)
        ww = huber_weight(r2, robust_delta) * w
        sw = jnp.sqrt(ww)[:, None, None]
        Ji, Jj = Ji * sw, Jj * sw
        r_w = r * sw[..., 0]
        cost = jnp.sum(ww * r2)

        H = jnp.zeros((Lloc, Lloc, 6, 6))
        b = jnp.zeros((Lloc, 6))
        H = H.at[src, src].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[dst, dst].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        H = H.at[src, dst].add(Hij)
        H = H.at[dst, src].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[src].add(jnp.einsum("eki,ek->ei", Ji, r_w))
        b = b.at[dst].add(jnp.einsum("eki,ek->ei", Jj, r_w))

        # damping + identity rows for padded internal slots. Separator
        # diagonals are psum-reduced across D shards, so damp them by
        # lam/D to reconstruct exactly lam after the reduction.
        pad = jnp.concatenate([jnp.ones(K, bool), ivalid])
        eye6 = jnp.eye(6)
        damp = jnp.concatenate([jnp.full((K,), lam_s / D),
                                jnp.full((Ni,), lam_s)])
        H = H.at[jnp.arange(Lloc), jnp.arange(Lloc)].add(
            damp[:, None, None] * eye6[None]
            + (1.0 - pad.astype(H.dtype))[:, None, None] * eye6[None])

        # eliminate internals: per-shard dense Cholesky of H_ii
        H_ii = H[K:, K:].transpose(0, 2, 1, 3).reshape(Ni * 6, Ni * 6)
        H_si = H[:K, K:].transpose(0, 2, 1, 3).reshape(K * 6, Ni * 6)
        b_i = b[K:].reshape(Ni * 6)
        Lc = jnp.linalg.cholesky(H_ii + 1e-8 * jnp.eye(Ni * 6))
        # H_ii^-1 [H_is | b_i]
        rhs_blk = jnp.concatenate([H_si.T, b_i[:, None]], 1)
        y = jax.scipy.linalg.solve_triangular(Lc, rhs_blk, lower=True)
        sol = jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)
        Hinv_His, Hinv_bi = sol[:, :-1], sol[:, -1]

        # H_ss per shard already sums to the global block under psum:
        # sep-sep edges carry weight 1/D on every shard, int-sep blocks
        # live only on their owner shard.
        S_local = (H[:K, :K].transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
                   - H_si @ Hinv_His)
        rhs_sep_local = b[:K].reshape(K * 6) - H_si @ Hinv_bi

        S = jax.lax.psum(S_local, "data")
        rhs = jax.lax.psum(rhs_sep_local, "data")
        cost = jax.lax.psum(cost, "data")

        if fix_first:  # pose 0 is always separator rank 0
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (K - 1))])
            S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            rhs = rhs * mask
        Ls = jnp.linalg.cholesky(S + 1e-8 * jnp.eye(K * 6))
        ys = jax.scipy.linalg.solve_triangular(Ls, rhs, lower=True)
        dx_s = -jax.scipy.linalg.solve_triangular(Ls.T, ys, lower=False)

        # back-substitute internals locally: dx_i = -H_ii^-1 (b_i + H_is dx_s)
        dx_i = -(Hinv_bi + Hinv_His @ dx_s)
        return dx_s.reshape(K, 6), dx_i.reshape(Ni, 6), cost[None]

    # gather initial pose tables
    def gather(poses):
        return (poses.r.q.data[sep_ids], poses.t[sep_ids],
                poses.r.q.data[int_ids.reshape(-1)],
                poses.t[int_ids.reshape(-1)])

    def scatter(poses, dx_s, dx_i):
        dx = jnp.zeros((N, 6))
        dx = dx.at[sep_ids].set(dx_s)
        # padded internal slots alias global pose 0 — masked .add is a no-op
        # there, while real internal ids are unique so add == set
        dx = dx.at[int_ids.reshape(-1)].add(
            dx_i * int_valid_flat[:, None])
        if fix_first:
            dx = dx.at[0].set(0.0)
        dT = Se3.exp(dx)
        return Se3(dT.r * poses.r,
                   jnp.einsum("nij,nj->ni", dT.r.matrix(), poses.t) + dT.t)

    def cost_global(poses):
        qi = poses.r.q.data[graph.src]
        ti = poses.t[graph.src]
        qj = poses.r.q.data[graph.dst]
        tj = poses.t[graph.dst]
        z = jnp.zeros((graph.src.shape[0], 6))
        r = jax.vmap(_edge_residual)(z, z, qi, ti, qj, tj,
                                     graph.meas.r.q.data, graph.meas.t)
        r2 = jnp.sum(r * r, -1)
        return jnp.sum(huber_weight(r2, robust_delta) * graph.weight
                       * graph.valid * r2)

    def step(carry, _):
        poses, lam = carry
        sq, st, iq, it = gather(poses)
        dx_s, dx_i, cost = lm_iter(sq, st, iq, it, e_src, e_dst, e_meas_q,
                                   e_meas_t, e_w, int_valid_flat,
                                   jnp.broadcast_to(lam, (1,)))
        new_poses = scatter(poses, dx_s, dx_i)
        new_cost = cost_global(new_poses)
        accept = new_cost < cost[0]
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_poses, poses)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (poses, lam), jnp.where(accept, new_cost, cost[0])

    (poses, _), costs = jax.lax.scan(
        step, (poses, jnp.asarray(init_lambda)), None, length=num_iters)
    return poses, costs


def distributed_pose_graph_streaming(
    mesh: Mesh,
    poses: Se3,
    graph: PoseGraph,
    part: PartitionedGraph,
    num_iters: int = 10,
    init_lambda: float = 1e-4,
    robust_delta: float = 1.0,
    fix_first: bool = True,
    cg_iters: int = 64,
    cg_tol: float = 1e-7,
) -> Tuple[Se3, jax.Array]:
    """Beyond-VMEM pose-graph LM: the separator system is NEVER
    materialized (ROADMAP "block-CSR Hessian export").

    The dense path (`distributed_pose_graph`) assembles H as a
    (Lloc, Lloc, 6, 6) array, forms H_ii^-1 H_is densely, and psums the
    full (K*6)^2 separator Schur complement — all O(K^2) memory, which
    caps the separator count at VMEM scale. Here the Hessian stays in
    BLOCK-CSR form (per-edge 6x6 blocks + per-node diagonal blocks
    streaming from HBM), internals are eliminated matrix-FREE (Cholesky
    factor of the per-shard internal block only), and the separator
    system is solved by block-Jacobi-preconditioned CG whose matvec

        S x = H_ss x - H_si (H_ii^-1 (H_is x))

    applies edge blocks by gather/scatter-add and costs one (K*6) psum —
    O(K) memory and O(K) DCN traffic per matvec versus the dense path's
    O(K^2) psum per LM iteration. Same PartitionedGraph layout; the two
    paths agree to CG tolerance (tests/test_dist_posegraph.py).
    """
    K, Ni = part.num_separators, part.num_internal
    D = mesh.shape["data"]
    N = poses.t.shape[0]

    sep_ids = jnp.asarray(part.sep_ids)
    int_ids = jnp.asarray(part.int_ids)
    int_valid = jnp.asarray(part.int_valid)
    e_src = jnp.asarray(part.src).reshape(-1)
    e_dst = jnp.asarray(part.dst).reshape(-1)
    e_meas_q = graph.meas.r.q.data[jnp.asarray(part.edge_id).reshape(-1)]
    e_meas_t = graph.meas.t[jnp.asarray(part.edge_id).reshape(-1)]
    e_w = (jnp.asarray(part.edge_w).reshape(-1)
           * graph.weight[jnp.asarray(part.edge_id).reshape(-1)])
    int_valid_flat = int_valid.reshape(D * Ni)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P("data"), P()),
        check_vma=False)
    def lm_iter(sep_q, sep_t, int_q, int_t, src, dst, mq, mt, w, ivalid,
                lam):
        lam_s = lam[0]
        q_all = jnp.concatenate([sep_q, int_q], 0)
        t_all = jnp.concatenate([sep_t, int_t], 0)
        E = src.shape[0]
        zeros6 = jnp.zeros((E, 6))

        def res_jac(z6a, z6b, a, b, c, d, e, f):
            r = _edge_residual(z6a, z6b, a, b, c, d, e, f)
            Ji = jax.jacfwd(lambda z: _edge_residual(
                z, z6b, a, b, c, d, e, f))(z6a)
            Jj = jax.jacfwd(lambda z: _edge_residual(
                z6a, z, a, b, c, d, e, f))(z6b)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(res_jac)(
            zeros6, zeros6, q_all[src], t_all[src], q_all[dst], t_all[dst],
            mq, mt)
        r2 = jnp.sum(r * r, -1)
        ww = huber_weight(r2, robust_delta) * w
        sw = jnp.sqrt(ww)[:, None, None]
        Ji, Jj = Ji * sw, Jj * sw
        r_w = r * sw[..., 0]
        cost = jnp.sum(ww * r2)

        # ---- block-CSR Hessian: per-node diagonal blocks + per-edge
        # off-diagonal blocks; nothing (Lloc x Lloc) is ever formed -----
        Lloc = K + Ni
        Hd = jnp.zeros((Lloc, 6, 6))
        b = jnp.zeros((Lloc, 6))
        Hd = Hd.at[src].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        Hd = Hd.at[dst].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        Hoff = jnp.einsum("eki,ekj->eij", Ji, Jj)  # block (src, dst)
        b = b.at[src].add(jnp.einsum("eki,ek->ei", Ji, r_w))
        b = b.at[dst].add(jnp.einsum("eki,ek->ei", Jj, r_w))

        pad = jnp.concatenate([jnp.ones(K, bool), ivalid])
        eye6 = jnp.eye(6)
        damp = jnp.concatenate([jnp.full((K,), lam_s / D),
                                jnp.full((Ni,), lam_s)])
        Hd = Hd + (damp[:, None, None] * eye6[None]
                   + (1.0 - pad.astype(Hd.dtype))[:, None, None] * eye6[None])

        # ---- internal elimination: factor the per-shard H_ii ONLY ------
        # (dense in the SHARD's internal count — bounded by submap size,
        # not by the global separator count)
        is_ii = (src >= K) & (dst >= K)
        si = jnp.where(is_ii, src - K, 0)
        di = jnp.where(is_ii, dst - K, 0)
        H_ii = jnp.zeros((Ni, Ni, 6, 6))
        H_ii = H_ii.at[jnp.arange(Ni), jnp.arange(Ni)].add(Hd[K:])
        m_ii = is_ii.astype(Hoff.dtype)[:, None, None]
        H_ii = H_ii.at[si, di].add(Hoff * m_ii)
        H_ii = H_ii.at[di, si].add(jnp.swapaxes(Hoff, -1, -2) * m_ii)
        H_ii = H_ii.transpose(0, 2, 1, 3).reshape(Ni * 6, Ni * 6)
        Lc = jnp.linalg.cholesky(H_ii + 1e-8 * jnp.eye(Ni * 6))

        def Hii_solve(v):  # (Ni*6,)
            y = jax.scipy.linalg.solve_triangular(Lc, v, lower=True)
            return jax.scipy.linalg.solve_triangular(Lc.T, y, lower=False)

        # edge classes for the sparse (block-CSR) applications; masked
        # edges use CLIPPED indices so their zeroed contributions land
        # in-bounds (negative python-wraparound indices would corrupt)
        is_ss = (src < K) & (dst < K)
        is_mix = (src < K) ^ (dst < K)  # one separator endpoint
        sep_end = jnp.clip(jnp.where(src < K, src, dst), 0, K - 1)
        int_end = jnp.clip(jnp.where(src < K, dst, src) - K, 0, Ni - 1)
        src_s = jnp.clip(src, 0, K - 1)
        dst_s = jnp.clip(dst, 0, K - 1)
        # block coupling separator -> internal: Hoff if src is the
        # separator, Hoff^T if dst is
        blk_si = jnp.where((src < K)[:, None, None], Hoff,
                           jnp.swapaxes(Hoff, -1, -2))
        m_mix = is_mix.astype(Hoff.dtype)[:, None, None]
        m_ss = is_ss.astype(Hoff.dtype)[:, None, None]

        def His_apply(x):  # (K, 6) -> (Ni, 6): internal rows of H_is x
            return jnp.zeros((Ni, 6)).at[int_end].add(jnp.einsum(
                "eij,ej->ei", jnp.swapaxes(blk_si, -1, -2) * m_mix,
                x[sep_end]))

        def Hsi_apply(u):  # (Ni, 6) -> (K, 6): separator rows of H_si u
            return jnp.zeros((K, 6)).at[sep_end].add(jnp.einsum(
                "eij,ej->ei", blk_si * m_mix, u[int_end]))

        def S_matvec(x):  # x (K, 6) replicated; returns psummed S x
            # gauge: project out block 0 on input AND output (the dense
            # path masks row+column and sets an identity diagonal — this
            # keeps the CG operator symmetric)
            xg = x.at[0].set(0.0) if fix_first else x
            y = jnp.einsum("kij,kj->ki", Hd[:K], xg)
            y = y.at[src_s].add(
                jnp.einsum("eij,ej->ei", Hoff * m_ss, xg[dst_s]))
            y = y.at[dst_s].add(
                jnp.einsum("eij,ej->ei",
                           jnp.swapaxes(Hoff, -1, -2) * m_ss, xg[src_s]))
            u = Hii_solve(His_apply(xg).reshape(Ni * 6)).reshape(Ni, 6)
            y = y - Hsi_apply(u)  # S x = H_ss x - H_si Hii^-1 H_is x
            y = jax.lax.psum(y, "data")
            if fix_first:  # identity row for the gauge block
                y = y.at[0].set(x[0])
            return y

        # rhs: b_s - H_si Hii^-1 b_i
        b_i = b[K:] * ivalid[:, None]
        u0 = Hii_solve(b_i.reshape(Ni * 6)).reshape(Ni, 6)
        rhs = jax.lax.psum(b[:K] - Hsi_apply(u0), "data")
        cost = jax.lax.psum(cost, "data")
        if fix_first:
            rhs = rhs.at[0].set(0.0)

        # block-Jacobi preconditioner from the psummed separator diagonal
        Md = jax.lax.psum(Hd[:K], "data")  # (K, 6, 6)
        if fix_first:
            Md = Md.at[0].set(jnp.eye(6))
        Minv = jnp.linalg.inv(Md + 1e-8 * jnp.eye(6)[None])

        def precond(v):
            return jnp.einsum("kij,kj->ki", Minv, v)

        # ---- PCG on the separator system ------------------------------
        x0 = jnp.zeros((K, 6))
        r0 = rhs  # b - S*0
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)
        r_norm0 = jnp.sum(rhs * rhs)

        def cg_body(state):
            i, x, rr, z, p, rz = state
            Sp = S_matvec(p)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-30)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return i + 1, x, rr, z, p, rz_new

        def cg_cond(state):
            i, x, rr, z, p, rz = state
            return (i < cg_iters) & (jnp.sum(rr * rr)
                                     > cg_tol * cg_tol * r_norm0)

        _, xs_sol, *_ = jax.lax.while_loop(
            cg_cond, cg_body, (0, x0, r0, z0, p0, rz0))
        dx_s = -xs_sol
        if fix_first:
            dx_s = dx_s.at[0].set(0.0)

        # back-substitute internals: dx_i = -Hii^-1 (b_i + H_is dx_s)
        v = His_apply(dx_s)
        dx_i = -Hii_solve((b_i + v).reshape(Ni * 6)).reshape(Ni, 6)
        return dx_s, dx_i, cost[None]

    def gather(poses):
        return (poses.r.q.data[sep_ids], poses.t[sep_ids],
                poses.r.q.data[int_ids.reshape(-1)],
                poses.t[int_ids.reshape(-1)])

    def scatter(poses, dx_s, dx_i):
        dx = jnp.zeros((N, 6))
        dx = dx.at[sep_ids].set(dx_s)
        dx = dx.at[int_ids.reshape(-1)].add(dx_i * int_valid_flat[:, None])
        if fix_first:
            dx = dx.at[0].set(0.0)
        dT = Se3.exp(dx)
        return Se3(dT.r * poses.r,
                   jnp.einsum("nij,nj->ni", dT.r.matrix(), poses.t) + dT.t)

    def cost_global(poses):
        qi = poses.r.q.data[graph.src]
        ti = poses.t[graph.src]
        qj = poses.r.q.data[graph.dst]
        tj = poses.t[graph.dst]
        z = jnp.zeros((graph.src.shape[0], 6))
        r = jax.vmap(_edge_residual)(z, z, qi, ti, qj, tj,
                                     graph.meas.r.q.data, graph.meas.t)
        r2 = jnp.sum(r * r, -1)
        return jnp.sum(huber_weight(r2, robust_delta) * graph.weight
                       * graph.valid * r2)

    def step(carry, _):
        poses, lam = carry
        sq, st, iq, it = gather(poses)
        dx_s, dx_i, cost = lm_iter(sq, st, iq, it, e_src, e_dst, e_meas_q,
                                   e_meas_t, e_w, int_valid_flat,
                                   jnp.broadcast_to(lam, (1,)))
        new_poses = scatter(poses, dx_s, dx_i)
        new_cost = cost_global(new_poses)
        accept = new_cost < cost[0]
        poses = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_poses, poses)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (poses, lam), jnp.where(accept, new_cost, cost[0])

    (poses, _), costs = jax.lax.scan(
        step, (poses, jnp.asarray(init_lambda)), None, length=num_iters)
    return poses, costs
