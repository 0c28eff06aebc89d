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
           "PartitionedGraph"]


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
) -> Tuple[Se3, jax.Array]:
    """LM over the submap-sharded pose graph. Returns (poses (N,), costs).

    poses: (N,) Se3 in GLOBAL order; the partition layout is internal.
    """
    K, Ni = part.num_separators, part.num_internal
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
