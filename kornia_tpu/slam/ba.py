"""Bundle adjustment backend (NEW — no reference counterpart; SURVEY.md §7
step 7: "Se3 manifold optimization, Gauss-Newton/LM with robust kernels,
Schur complement over camera/point blocks").

TPU-first design:
  * State is a pytree: camera poses as Se3 (world→cam), points (P, 3),
    shared intrinsics K. Optimization runs on tangent increments
    (retraction Se3.exp(dx) ∘ T) — no quaternion drift.
  * Observations are STATIC arrays (O,) cam_idx / pt_idx / uv / valid —
    padded observation lists jit cleanly.
  * Per-observation 2x6 / 2x3 Jacobians come from `jax.jacfwd` of the
    single-observation residual, vmapped — exact, no hand-derived chain
    rules to maintain.
  * Normal equations exploit the bipartite structure: H_cc is
    block-diagonal (C, 6, 6) via segment_sum, H_pp block-diagonal
    (P, 3, 3), and the coupling enters through the dense (C*6, P*3)
    W = H_cp (scatter-add of per-obs blocks). The reduced camera system
    S = H_cc - W Hpp⁻¹ Wᵀ is ONE batched matmul chain on the MXU, then a
    Cholesky solve. Point updates back-substitute in closed form
    (batched 3x3 solves).
  * Robust kernels: any IRLS weight from kornia_tpu.losses.robust.
  * LM damping with accept/reject, fixed trip count (`lax.scan`).

The distributed variant (map sharded over a mesh, camera-block all-gather
+ reduced-system psum over ICI) lives in kornia_tpu/parallel/dist_ba.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..geometry.liegroup import Se3, So3
from ..losses.robust import huber_weight

__all__ = ["BAProblem", "BAState", "bundle_adjust", "reprojection_residuals"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BAProblem:
    """Static observation structure.

    cam_idx, pt_idx: (O,) int32; uv: (O, 2) pixel observations;
    valid: (O,) bool (padding mask); K: (3, 3) shared intrinsics;
    fix_first_cam: gauge fixing by freezing camera 0.
    """

    cam_idx: jax.Array
    pt_idx: jax.Array
    uv: jax.Array
    valid: jax.Array
    K: jax.Array

    def tree_flatten(self):
        return (self.cam_idx, self.pt_idx, self.uv, self.valid, self.K), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BAState:
    poses: Se3  # (C,) batched world→camera
    points: jax.Array  # (P, 3)

    def tree_flatten(self):
        return (self.poses, self.points), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _project(pose_q: jax.Array, pose_t: jax.Array, X: jax.Array,
             K: jax.Array) -> jax.Array:
    """Project one world point with one pose (wxyz quaternion + t)."""
    R = So3.from_wxyz(pose_q).matrix()
    Xc = R @ X + pose_t
    z = jnp.where(jnp.abs(Xc[2]) > 1e-8, Xc[2], 1e-8)
    u = K[0, 0] * Xc[0] / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v])


def _residual_one(dx_cam: jax.Array, dx_pt: jax.Array, pose_q: jax.Array,
                  pose_t: jax.Array, X: jax.Array, uv: jax.Array,
                  K: jax.Array) -> jax.Array:
    """Residual at a tangent perturbation (dx_cam (6,), dx_pt (3,))."""
    dT = Se3.exp(dx_cam)
    Rd = dT.r.matrix()
    q = So3.from_wxyz(pose_q)
    R_new = Rd @ q.matrix()
    t_new = Rd @ pose_t + dT.t
    Xc = R_new @ (X + dx_pt) + t_new
    z = jnp.where(jnp.abs(Xc[2]) > 1e-8, Xc[2], 1e-8)
    u = K[0, 0] * Xc[0] / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v]) - uv


def reprojection_residuals(state: BAState, problem: BAProblem) -> jax.Array:
    """(O, 2) residuals at the current state."""
    q = state.poses.r.q.data[problem.cam_idx]
    t = state.poses.t[problem.cam_idx]
    X = state.points[problem.pt_idx]
    zeros6 = jnp.zeros((problem.cam_idx.shape[0], 6))
    zeros3 = jnp.zeros((problem.cam_idx.shape[0], 3))
    res = jax.vmap(_residual_one, in_axes=(0, 0, 0, 0, 0, 0, None))(
        zeros6, zeros3, q, t, X, problem.uv, problem.K)
    return jnp.where(problem.valid[:, None], res, 0.0)


def _build_normal_eqs(state: BAState, problem: BAProblem, C: int, P: int,
                      weight_fn: Callable):
    """Assemble H_cc (C,6,6), H_pp (P,3,3), W (C,P,6,3), b_c (C,6), b_p (P,3)."""
    q = state.poses.r.q.data[problem.cam_idx]
    t = state.poses.t[problem.cam_idx]
    X = state.points[problem.pt_idx]
    O = problem.cam_idx.shape[0]
    zeros6 = jnp.zeros((O, 6))
    zeros3 = jnp.zeros((O, 3))

    def res_and_jac(z6, z3, qq, tt, XX, uv):
        r = _residual_one(z6, z3, qq, tt, XX, uv, problem.K)
        Jc = jax.jacfwd(lambda d: _residual_one(d, z3, qq, tt, XX, uv, problem.K))(z6)
        Jp = jax.jacfwd(lambda d: _residual_one(z6, d, qq, tt, XX, uv, problem.K))(z3)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(res_and_jac)(zeros6, zeros3, q, t, X, problem.uv)
    r2 = jnp.sum(r * r, axis=-1)
    w = weight_fn(r2) * problem.valid.astype(r.dtype)
    Jc = Jc * jnp.sqrt(w)[:, None, None]
    Jp = Jp * jnp.sqrt(w)[:, None, None]
    r_w = r * jnp.sqrt(w)[:, None]

    Hcc_obs = jnp.einsum("oki,okj->oij", Jc, Jc)  # (O, 6, 6)
    Hpp_obs = jnp.einsum("oki,okj->oij", Jp, Jp)  # (O, 3, 3)
    Wcp_obs = jnp.einsum("oki,okj->oij", Jc, Jp)  # (O, 6, 3)
    bc_obs = jnp.einsum("oki,ok->oi", Jc, r_w)  # (O, 6)
    bp_obs = jnp.einsum("oki,ok->oi", Jp, r_w)  # (O, 3)

    H_cc = jax.ops.segment_sum(Hcc_obs, problem.cam_idx, num_segments=C)
    H_pp = jax.ops.segment_sum(Hpp_obs, problem.pt_idx, num_segments=P)
    b_c = jax.ops.segment_sum(bc_obs, problem.cam_idx, num_segments=C)
    b_p = jax.ops.segment_sum(bp_obs, problem.pt_idx, num_segments=P)
    # dense coupling: scatter per-obs blocks into (C, P, 6, 3)
    flat_idx = problem.cam_idx * P + problem.pt_idx
    W = jax.ops.segment_sum(Wcp_obs, flat_idx, num_segments=C * P)
    W = W.reshape(C, P, 6, 3)
    cost = jnp.sum(w * r2)
    return H_cc, H_pp, W, b_c, b_p, cost, r


def _schur_solve(H_cc, H_pp, W, b_c, b_p, lam, fix_first_cam: int):
    """Solve the damped normal equations via the Schur complement."""
    C = H_cc.shape[0]
    P = H_pp.shape[0]
    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    eye3 = jnp.eye(3, dtype=H_pp.dtype)
    H_cc_d = H_cc + lam * eye6[None]
    H_pp_d = H_pp + lam * eye3[None]
    Hpp_inv = jnp.linalg.inv(H_pp_d)  # batched 3x3, closed-form path in XLA

    # S = H_cc_blkdiag - W Hpp_inv Wᵀ ; big MXU einsum over points
    WHinv = jnp.einsum("cpij,pjk->cpik", W, Hpp_inv)  # (C, P, 6, 3)
    S_off = jnp.einsum("cpik,dpjk->cdij", WHinv, W)  # (C, C, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(H_cc_d)
    rhs = b_c - jnp.einsum("cpik,pk->ci", WHinv, b_p)  # (C, 6)

    S_mat = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    rhs_vec = rhs.reshape(C * 6)
    n_fix = int(fix_first_cam)
    if n_fix:
        # gauge fixing: zero out the first n_fix cameras' rows/cols, unit
        # diagonal (monocular windows fix TWO cameras: 6-dof frame + scale)
        mask = jnp.concatenate([jnp.zeros(6 * n_fix),
                                jnp.ones(6 * (C - n_fix))])
        S_mat = S_mat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        rhs_vec = rhs_vec * mask
    # solve via Cholesky (S is SPD after damping)
    L = jnp.linalg.cholesky(S_mat + 1e-8 * jnp.eye(C * 6, dtype=S_mat.dtype))
    y = jax.scipy.linalg.solve_triangular(L, rhs_vec, lower=True)
    dx_c = jax.scipy.linalg.solve_triangular(L.T, y, lower=False).reshape(C, 6)
    # back-substitute points: dx_p = Hpp_inv (b_p - Wᵀ dx_c)
    Wt_dxc = jnp.einsum("cpij,ci->pj", W, dx_c)
    dx_p = jnp.einsum("pij,pj->pi", Hpp_inv, b_p - Wt_dxc)
    return -dx_c, -dx_p  # GN step solves H dx = -b


def _apply_step(state: BAState, dx_c: jax.Array, dx_p: jax.Array) -> BAState:
    dT = Se3.exp(dx_c)
    new_r = dT.r * state.poses.r
    new_t = jnp.einsum("cij,cj->ci", dT.r.matrix(), state.poses.t) + dT.t
    return BAState(Se3(new_r, new_t), state.points + dx_p)


@partial(jax.jit, static_argnames=("num_iters", "fix_first_cam", "num_cameras",
                                   "num_points", "robust"))
@f32_matmul_precision
def bundle_adjust(
    state: BAState,
    problem: BAProblem,
    num_cameras: int,
    num_points: int,
    num_iters: int = 10,
    init_lambda: float = 1e-3,
    robust_delta: float = 3.0,
    robust: str = "huber",
    fix_first_cam: int = 1,
) -> Tuple[BAState, jax.Array]:
    """Levenberg-Marquardt BA. Returns (state, per-iteration costs).

    fix_first_cam: number of leading cameras held fixed for gauge freedom
    (bool accepted: True == 1). Monocular sliding windows should fix 2 —
    the 7th (scale) gauge dof is anchored by the second pose.

    robust: 'huber' | 'cauchy' | 'geman_mcclure' | 'tukey' | 'none'.
    Cauchy is the best default under gross outliers; the redescending
    kernels (tukey/geman) reject everything when initialized far from the
    optimum — they need graduated non-convexity (future work) and should
    only be used to polish a nearly-converged solution."""
    from ..losses.robust import (cauchy_weight, geman_mcclure_weight,
                                 tukey_weight)
    C, P = num_cameras, num_points
    kernels = {
        "huber": lambda r2: huber_weight(r2, robust_delta),
        "cauchy": lambda r2: cauchy_weight(r2, robust_delta),
        "geman_mcclure": lambda r2: geman_mcclure_weight(r2, robust_delta),
        "tukey": lambda r2: tukey_weight(r2, 3.0 * robust_delta),
        "none": lambda r2: jnp.ones_like(r2),
    }
    weight_fn = kernels[robust]

    def step(carry, _):
        state, lam = carry
        H_cc, H_pp, W, b_c, b_p, cost, _ = _build_normal_eqs(
            state, problem, C, P, weight_fn)
        dx_c, dx_p = _schur_solve(H_cc, H_pp, W, b_c, b_p, lam, fix_first_cam)
        if fix_first_cam:
            dx_c = dx_c.at[:int(fix_first_cam)].set(0.0)
        new_state = _apply_step(state, dx_c, dx_p)
        _, _, _, _, _, new_cost, _ = _build_normal_eqs(
            new_state, problem, C, P, weight_fn)
        accept = new_cost < cost
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept, a, b), new_state, state)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e4)
        return (state, lam), jnp.where(accept, new_cost, cost)

    (state, _), costs = jax.lax.scan(
        step, (state, jnp.asarray(init_lambda)), None, length=num_iters)
    return state, costs
