"""Distributed bundle adjustment over a device mesh (NEW — BASELINE.json
configs 3-5; no reference counterpart).

Sharding layout (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives):

  * the MAP is sharded: each device on the ``data`` axis owns a block of
    points and the observations of those points (camera-point bipartite
    structure cut along points — cameras are replicated, points are not;
    observations never straddle devices),
  * each device computes its local H_pp blocks, local W = H_cp slice and
    its partial reduced camera system S_local = W·Hpp⁻¹·Wᵀ,
  * ONE ``psum`` over ICI reduces {S, H_cc, b_c, schur rhs} (6C x 6C —
    small), every device solves the replicated camera system redundantly
    (cheaper than sharding a 6Cx6C Cholesky), then back-substitutes its
    OWN point block locally with zero further communication.

Interface contract: observations are pre-partitioned by point block —
`pt_idx` is LOCAL to the shard, `cam_idx` is global. Padding rows have
valid=False. This is exactly the layout a keyframe-windowed VO produces.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.liegroup import Se3, So3
from ..losses.robust import huber_weight
from ..slam.ba import BAProblem, BAState, _apply_step, _build_normal_eqs

__all__ = ["distributed_bundle_adjust"]


def _local_normal_eqs(poses_q, poses_t, points_local, cam_idx, pt_idx, uv,
                      valid, K, C, P_local, weight_fn):
    """Per-shard normal equations; mirrors slam.ba._build_normal_eqs but on
    a local point block."""
    from ..slam.ba import _residual_one

    O = cam_idx.shape[0]
    q = poses_q[cam_idx]
    t = poses_t[cam_idx]
    X = points_local[pt_idx]
    zeros6 = jnp.zeros((O, 6))
    zeros3 = jnp.zeros((O, 3))

    def res_and_jac(z6, z3, qq, tt, XX, uvi):
        r = _residual_one(z6, z3, qq, tt, XX, uvi, K)
        Jc = jax.jacfwd(lambda d: _residual_one(d, z3, qq, tt, XX, uvi, K))(z6)
        Jp = jax.jacfwd(lambda d: _residual_one(z6, d, qq, tt, XX, uvi, K))(z3)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(res_and_jac)(zeros6, zeros3, q, t, X, uv)
    r2 = jnp.sum(r * r, axis=-1)
    w = weight_fn(r2) * valid.astype(r.dtype)
    sw = jnp.sqrt(w)
    Jc = Jc * sw[:, None, None]
    Jp = Jp * sw[:, None, None]
    r_w = r * sw[:, None]

    H_cc = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", Jc, Jc), cam_idx, num_segments=C)
    H_pp = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", Jp, Jp), pt_idx, num_segments=P_local)
    b_c = jax.ops.segment_sum(
        jnp.einsum("oki,ok->oi", Jc, r_w), cam_idx, num_segments=C)
    b_p = jax.ops.segment_sum(
        jnp.einsum("oki,ok->oi", Jp, r_w), pt_idx, num_segments=P_local)
    flat = cam_idx * P_local + pt_idx
    W = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", Jc, Jp), flat, num_segments=C * P_local
    ).reshape(C, P_local, 6, 3)
    cost = jnp.sum(w * r2)
    return H_cc, H_pp, W, b_c, b_p, cost


def distributed_bundle_adjust(
    mesh: Mesh,
    state: BAState,
    cam_idx: jax.Array,  # (D * O_shard,) global camera ids
    pt_idx: jax.Array,  # (D * O_shard,) LOCAL point ids within each shard
    uv: jax.Array,  # (D * O_shard, 2)
    valid: jax.Array,  # (D * O_shard,)
    K: jax.Array,
    num_cameras: int,
    num_iters: int = 8,
    init_lambda: float = 1e-3,
    robust_delta: float = 3.0,
    fix_first_cam: bool = True,
) -> Tuple[BAState, jax.Array]:
    """LM bundle adjustment with the map sharded over ``mesh['data']``.

    `state.points` has shape (D * P_shard, 3) and is sharded on the data
    axis; poses are replicated. Returns the optimized state and costs.
    """
    C = num_cameras
    weight_fn = lambda r2: huber_weight(r2, robust_delta)
    D = mesh.shape["data"]
    P_total = state.points.shape[0]
    P_local = P_total // D

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P()),
        out_specs=(P(), P(), P("data"), P()),
        check_vma=False,
    )
    def lm_iter(poses_q, poses_t, points_l, cam_i, pt_i, uv_l, valid_l, lam):
        H_cc, H_pp, W, b_c, b_p, cost = _local_normal_eqs(
            poses_q, poses_t, points_l, cam_i, pt_i, uv_l, valid_l, K, C,
            P_local, weight_fn)
        # global reductions over ICI
        H_cc = jax.lax.psum(H_cc, "data")
        b_c = jax.lax.psum(b_c, "data")
        cost = jax.lax.psum(cost, "data")
        lam_s = lam[0]
        eye6 = jnp.eye(6, dtype=H_cc.dtype)
        eye3 = jnp.eye(3, dtype=H_pp.dtype)
        Hpp_inv = jnp.linalg.inv(H_pp + lam_s * eye3[None])
        WHinv = jnp.einsum("cpij,pjk->cpik", W, Hpp_inv)
        S_local = jnp.einsum("cpik,dpjk->cdij", WHinv, W)
        rhs_local = jnp.einsum("cpik,pk->ci", WHinv, b_p)
        S = jax.lax.psum(S_local, "data")
        rhs_red = jax.lax.psum(rhs_local, "data")
        S_full = -S
        S_full = S_full.at[jnp.arange(C), jnp.arange(C)].add(
            H_cc + lam_s * eye6[None])
        rhs = (b_c - rhs_red).reshape(C * 6)
        S_mat = S_full.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        if fix_first_cam:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (C - 1))])
            S_mat = S_mat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            rhs = rhs * mask
        L = jnp.linalg.cholesky(S_mat + 1e-8 * jnp.eye(C * 6))
        y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        dx_c = jax.scipy.linalg.solve_triangular(
            L.T, y, lower=False).reshape(C, 6)
        dx_c = -dx_c
        # local point back-substitution — no communication
        Wt_dxc = jnp.einsum("cpij,ci->pj", W, -dx_c)
        dx_p = -jnp.einsum("pij,pj->pi", Hpp_inv, b_p - Wt_dxc)
        return dx_c, cost[None], dx_p, b_c

    def cost_only(state):
        problem = BAProblem(cam_idx, _global_pt(pt_idx, D, P_local), uv, valid, K)
        from ..slam.ba import reprojection_residuals
        r = reprojection_residuals(state, problem)
        r2 = jnp.sum(r * r, -1)
        return jnp.sum(weight_fn(r2) * r2 * valid)

    def step(carry, _):
        state, lam = carry
        dx_c, cost, dx_p, _ = lm_iter(
            state.poses.r.q.data, state.poses.t, state.points,
            cam_idx, pt_idx, uv, valid, jnp.broadcast_to(lam, (1,)))
        if fix_first_cam:
            dx_c = dx_c.at[0].set(0.0)
        new_state = _apply_step(state, dx_c, dx_p)
        new_cost = cost_only(new_state)
        accept = new_cost < cost[0]
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_state, state)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (state, jnp.clip(lam, 1e-8, 1e4)), jnp.where(accept, new_cost,
                                                            cost[0])

    (state, _), costs = jax.lax.scan(
        step, (state, jnp.asarray(init_lambda)), None, length=num_iters)
    return state, costs


def _global_pt(pt_idx_local: jax.Array, D: int, P_local: int) -> jax.Array:
    """Convert shard-local point ids to global ids (shard s owns
    [s*P_local, (s+1)*P_local))."""
    O_total = pt_idx_local.shape[0]
    O_shard = O_total // D
    shard = jnp.arange(O_total) // O_shard
    return pt_idx_local + shard * P_local
