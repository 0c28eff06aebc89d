"""Pose-graph optimization (NEW — no reference counterpart; SURVEY.md §7).

Nodes are Se3 poses; edges are relative-pose measurements with 6x6
information matrices. Gauss-Newton on the manifold with dense normal
equations (fine up to a few hundred keyframes; the submap-sharded variant
follows the dist_ba pattern).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..geometry.liegroup import Se3, So3
from ..losses.robust import huber_weight

__all__ = ["PoseGraph", "optimize_pose_graph", "optimize_pose_graph_sim3"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Edges: i -> j with measured T_ij (as (E,) Se3) and info weights (E,)."""

    src: jax.Array  # (E,) int32
    dst: jax.Array  # (E,) int32
    meas: Se3  # (E,) measured relative poses T_ij (i frame ← j frame)
    weight: jax.Array  # (E,) scalar information weight
    valid: jax.Array  # (E,) bool

    def tree_flatten(self):
        return (self.src, self.dst, self.meas, self.weight, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _edge_residual(dx_i: jax.Array, dx_j: jax.Array, qi, ti, qj, tj,
                   qm, tm) -> jax.Array:
    """log( T_meas⁻¹ · (exp(dx_i) Ti)⁻¹ · (exp(dx_j) Tj) ) ∈ R⁶."""
    Ti = Se3(So3.from_wxyz(qi), ti)
    Tj = Se3(So3.from_wxyz(qj), tj)
    Tm = Se3(So3.from_wxyz(qm), tm)
    Ti_new = Se3.exp(dx_i) * Ti
    Tj_new = Se3.exp(dx_j) * Tj
    err = Tm.inverse() * (Ti_new.inverse() * Tj_new)
    return err.log()


@partial(jax.jit, static_argnames=("num_iters", "fix_first"))
@f32_matmul_precision
def optimize_pose_graph(
    poses: Se3,
    graph: PoseGraph,
    num_iters: int = 10,
    init_lambda: float = 1e-4,
    robust_delta: float = 1.0,
    fix_first: bool = True,
) -> Tuple[Se3, jax.Array]:
    """LM on the pose graph. poses: (N,) Se3. Returns (poses, costs)."""
    N = poses.t.shape[0]
    E = graph.src.shape[0]

    def build(poses, lam):
        qi = poses.r.q.data[graph.src]
        ti = poses.t[graph.src]
        qj = poses.r.q.data[graph.dst]
        tj = poses.t[graph.dst]
        qm = graph.meas.r.q.data
        tm = graph.meas.t
        zeros6 = jnp.zeros((E, 6))

        def res_jac(z6a, z6b, a, b, c, d, e, f):
            r = _edge_residual(z6a, z6b, a, b, c, d, e, f)
            Ji = jax.jacfwd(lambda z: _edge_residual(z, z6b, a, b, c, d, e, f))(z6a)
            Jj = jax.jacfwd(lambda z: _edge_residual(z6a, z, a, b, c, d, e, f))(z6b)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(res_jac)(zeros6, zeros6, qi, ti, qj, tj, qm, tm)
        r2 = jnp.sum(r * r, axis=-1)
        w = huber_weight(r2, robust_delta) * graph.weight * graph.valid
        sw = jnp.sqrt(w)[:, None, None]
        Ji = Ji * sw
        Jj = Jj * sw
        r_w = r * jnp.sqrt(w)[:, None]
        # dense H (N*6, N*6) via scatter of the four blocks
        H = jnp.zeros((N, N, 6, 6))
        b = jnp.zeros((N, 6))
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji)
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj)
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        bi = jnp.einsum("eki,ek->ei", Ji, r_w)
        bj = jnp.einsum("eki,ek->ei", Jj, r_w)
        H = H.at[graph.src, graph.src].add(Hii)
        H = H.at[graph.dst, graph.dst].add(Hjj)
        H = H.at[graph.src, graph.dst].add(Hij)
        H = H.at[graph.dst, graph.src].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[graph.src].add(bi)
        b = b.at[graph.dst].add(bj)
        cost = jnp.sum(w * r2)
        H_mat = H.transpose(0, 2, 1, 3).reshape(N * 6, N * 6)
        H_mat = H_mat + lam * jnp.eye(N * 6)
        b_vec = b.reshape(N * 6)
        if fix_first:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (N - 1))])
            H_mat = H_mat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            b_vec = b_vec * mask
        return H_mat, b_vec, cost

    def cost_only(poses):
        qi = poses.r.q.data[graph.src]
        ti = poses.t[graph.src]
        qj = poses.r.q.data[graph.dst]
        tj = poses.t[graph.dst]
        zeros6 = jnp.zeros((E, 6))
        r = jax.vmap(_edge_residual)(zeros6, zeros6, qi, ti, qj, tj,
                                     graph.meas.r.q.data, graph.meas.t)
        r2 = jnp.sum(r * r, axis=-1)
        return jnp.sum(huber_weight(r2, robust_delta) * graph.weight
                       * graph.valid * r2)

    def step(carry, _):
        poses, lam = carry
        H, b, cost = build(poses, lam)
        L = jnp.linalg.cholesky(H + 1e-8 * jnp.eye(H.shape[0]))
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        dx = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx = dx.reshape(N, 6)
        if fix_first:
            dx = dx.at[0].set(0.0)
        dT = Se3.exp(dx)
        new_poses = Se3(dT.r * poses.r,
                        jnp.einsum("nij,nj->ni", dT.r.matrix(), poses.t) + dT.t)
        new_cost = cost_only(new_poses)
        accept = new_cost < cost
        poses = jax.tree_util.tree_map(
            lambda a, b_: jnp.where(accept, a, b_), new_poses, poses)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (poses, lam), jnp.where(accept, new_cost, cost)

    (poses, _), costs = jax.lax.scan(
        step, (poses, jnp.asarray(init_lambda)), None, length=num_iters)
    return poses, costs


# ---------------------------------------------------------------------------
# Sim(3) pose-graph optimization — monocular loop closure
# ---------------------------------------------------------------------------

def _sim3_edge_residual(d_i, d_j, qi, ti, si, qj, tj, sj, qm, tm,
                        scale_weight=0.05):
    """Decoupled Sim(3) residual for edge i -> j with 7-dof local updates
    d = (omega(3), dt(3), dlog_s(1)) applied as R <- exp(omega) R,
    t <- t + dt, s <- s * exp(dlog_s).

    Node S_i acts x -> s_i R_i x + t_i; the predicted relative transform
    S_i^{-1} S_j has rotation R_i^T R_j, translation R_i^T (t_j - t_i)/s_i,
    scale s_j/s_i; the measurement carries (R_m, t_m, s_m = 1) from
    odometry / metric PnP loop edges (ORB-SLAM's essential-graph
    optimization over Sim(3); NEW vs the reference, which has no pose
    graph at all)."""
    Ri = (So3.exp(d_i[:3]) * So3.from_wxyz(qi)).matrix()
    Rj = (So3.exp(d_j[:3]) * So3.from_wxyz(qj)).matrix()
    ti = ti + d_i[3:6]
    tj = tj + d_j[3:6]
    lsi = si + d_i[6]
    lsj = sj + d_j[6]
    Rm = So3.from_wxyz(qm).matrix()
    R_rel = Ri.T @ Rj
    r_rot = So3.from_matrix(Rm.T @ R_rel).log()
    r_t = (Ri.T @ (tj - ti)) * jnp.exp(-lsi) - tm
    # the relative-scale prior (s_j/s_i = 1) is deliberately SOFT
    # (scale_weight << 1): monocular odometry edges carry no scale
    # observation, and a stiff prior would forbid exactly the scale-drift
    # absorption the Sim(3) graph exists for; the translation residuals
    # are what actually observe scale
    r_s = scale_weight * (lsj - lsi)
    return jnp.concatenate([r_rot, r_t, r_s[None]])


@partial(jax.jit, static_argnames=("num_iters", "fix_first"))
@f32_matmul_precision
def optimize_pose_graph_sim3(
    poses: Se3,
    graph: PoseGraph,
    num_iters: int = 15,
    init_lambda: float = 1e-4,
    robust_delta: float = 1.0,
    fix_first: bool = True,
) -> Tuple[Se3, jax.Array, jax.Array]:
    """LM over Sim(3) nodes (7 dof: rotation, translation, log-scale;
    scales start at 1). Returns (corrected Se3 poses, per-node scales,
    costs). The corrected Se3 output folds each node's optimized scale
    into its translation (camera center c = -R^T t / s), which is how a
    monocular trajectory absorbs scale drift around a closed loop."""
    N = poses.t.shape[0]
    E = graph.src.shape[0]
    q0 = poses.r.q.data
    t0 = poses.t
    ls0 = jnp.zeros((N,))

    def residuals_and_jac(q, t, ls, lam):
        qi = q[graph.src]
        ti = t[graph.src]
        lsi = ls[graph.src]
        qj = q[graph.dst]
        tj = t[graph.dst]
        lsj = ls[graph.dst]
        qm = graph.meas.r.q.data
        tm = graph.meas.t
        zeros7 = jnp.zeros((E, 7))

        def res_jac(z7a, z7b, a, b, c, d, e, f, g, h):
            r = _sim3_edge_residual(z7a, z7b, a, b, c, d, e, f, g, h)
            Ji = jax.jacfwd(lambda z: _sim3_edge_residual(
                z, z7b, a, b, c, d, e, f, g, h))(z7a)
            Jj = jax.jacfwd(lambda z: _sim3_edge_residual(
                z7a, z, a, b, c, d, e, f, g, h))(z7b)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(res_jac)(zeros7, zeros7, qi, ti, lsi,
                                      qj, tj, lsj, qm, tm)
        r2 = jnp.sum(r * r, axis=-1)
        w = huber_weight(r2, robust_delta) * graph.weight * graph.valid
        sw = jnp.sqrt(w)[:, None, None]
        Ji = Ji * sw
        Jj = Jj * sw
        r_w = r * jnp.sqrt(w)[:, None]
        H = jnp.zeros((N, N, 7, 7))
        bv = jnp.zeros((N, 7))
        H = H.at[graph.src, graph.src].add(
            jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[graph.dst, graph.dst].add(
            jnp.einsum("eki,ekj->eij", Jj, Jj))
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj)
        H = H.at[graph.src, graph.dst].add(Hij)
        H = H.at[graph.dst, graph.src].add(jnp.swapaxes(Hij, -1, -2))
        bv = bv.at[graph.src].add(jnp.einsum("eki,ek->ei", Ji, r_w))
        bv = bv.at[graph.dst].add(jnp.einsum("eki,ek->ei", Jj, r_w))
        cost = jnp.sum(w * r2)
        H_mat = H.transpose(0, 2, 1, 3).reshape(N * 7, N * 7)
        H_mat = H_mat + lam * jnp.eye(N * 7)
        b_vec = bv.reshape(N * 7)
        if fix_first:
            mask = jnp.concatenate([jnp.zeros(7), jnp.ones(7 * (N - 1))])
            H_mat = H_mat * mask[:, None] * mask[None, :] + \
                jnp.diag(1.0 - mask)
            b_vec = b_vec * mask
        return H_mat, b_vec, cost

    def cost_only(q, t, ls):
        qi = q[graph.src]
        qj = q[graph.dst]
        zeros7 = jnp.zeros((E, 7))
        r = jax.vmap(_sim3_edge_residual)(
            zeros7, zeros7, qi, t[graph.src], ls[graph.src],
            qj, t[graph.dst], ls[graph.dst],
            graph.meas.r.q.data, graph.meas.t)
        r2 = jnp.sum(r * r, axis=-1)
        return jnp.sum(huber_weight(r2, robust_delta) * graph.weight
                       * graph.valid * r2)

    def step(carry, _):
        q, t, ls, lam = carry
        H, b, cost = residuals_and_jac(q, t, ls, lam)
        L = jnp.linalg.cholesky(H + 1e-8 * jnp.eye(H.shape[0]))
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        dx = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        dx = dx.reshape(N, 7)
        if fix_first:
            dx = dx.at[0].set(0.0)
        q_new = (So3.exp(dx[:, :3]) * So3.from_wxyz(q)).q.data
        t_new = t + dx[:, 3:6]
        ls_new = ls + dx[:, 6]
        new_cost = cost_only(q_new, t_new, ls_new)
        accept = new_cost < cost
        q = jnp.where(accept, q_new, q)
        t = jnp.where(accept, t_new, t)
        ls = jnp.where(accept, ls_new, ls)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (q, t, ls, lam), jnp.where(accept, new_cost, cost)

    (q, t, ls, _), costs = jax.lax.scan(
        step, (q0, t0, ls0, jnp.asarray(init_lambda)), None,
        length=num_iters)
    s = jnp.exp(ls)
    # fold scale into the Se3 output: center c = -R^T t / s
    out = Se3(So3.from_wxyz(q), t * (1.0 / s)[:, None])
    return out, s, costs
