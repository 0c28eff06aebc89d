"""Sparse-Schur bundle adjustment + graduated non-convexity, TPU-native.

NEW — no reference counterpart (kornia has no BA). This is the
large-map backend promised in ROADMAP ("Sparse Schur for larger maps"):
the dense-coupling `slam/ba.py` materializes W as (C, P, 6, 3) and pays an
O(C^2 P) einsum for the reduced camera system; here the point-clique
structure of the bipartite BA graph is exploited instead.

TPU-first design:
- Observations are regrouped into PADDED PER-POINT TABLES (P, T) with a
  validity mask (T = max track length): every step stays static-shape.
- The reduced camera system S = H_cc - W Hpp^-1 W^T is assembled from
  per-point camera-pair contributions — an einsum over (P, T, T) pair
  blocks scattered by flattened camera-pair index with `segment_sum`.
  Cost O(P T^2) instead of O(C^2 P); memory O(P T^2) pair blocks instead
  of O(C P) coupling.
- Graduated non-convexity (Yang et al. 2020, GNC) makes the redescending
  kernels (tukey / geman_mcclure / welsch) usable from poor inits: an
  outer schedule anneals the surrogate scale from ~max residual down to
  the target, inner LM iterations reuse the same jitted step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.linalg import f32_matmul_precision
from ..losses.robust import (cauchy_weight, geman_mcclure_weight,
                             huber_weight, tukey_weight, welsch_weight)
from .ba import BAProblem, BAState, _apply_step, _residual_one

__all__ = ["build_point_tables", "bundle_adjust_sparse", "gnc_weight_fn"]


def build_point_tables(cam_idx: np.ndarray, pt_idx: np.ndarray,
                       valid: np.ndarray, num_points: int,
                       max_track: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: group observation indices by point.

    Returns (obs_idx (P, T) int32 indices into the observation arrays,
    obs_mask (P, T) bool). T = max_track or the longest observed track.
    """
    pt = np.asarray(pt_idx)
    v = np.asarray(valid).astype(bool)
    P = num_points
    lists: list[list[int]] = [[] for _ in range(P)]
    for o in range(pt.shape[0]):
        if v[o]:
            lists[int(pt[o])].append(o)
    T = max_track or max((len(l) for l in lists), default=1)
    T = max(T, 1)
    obs_idx = np.zeros((P, T), np.int32)
    obs_mask = np.zeros((P, T), bool)
    for p, l in enumerate(lists):
        n = min(len(l), T)
        obs_idx[p, :n] = l[:n]
        obs_mask[p, :n] = True
    return obs_idx, obs_mask


def gnc_weight_fn(base: str, delta: float, mu: jax.Array) -> Callable:
    """Surrogate IRLS weight for GNC: anneal the kernel scale by sqrt(mu).

    mu >= 1; mu -> 1 recovers the target kernel, large mu approaches the
    quadratic (all-inlier) loss. Annealing the scale c_mu = sqrt(mu) * c is
    the GNC-GM schedule of Yang et al. 2020 expressed on the scale."""
    kernels = {
        "tukey": tukey_weight,
        "geman_mcclure": geman_mcclure_weight,
        "welsch": welsch_weight,
        "cauchy": cauchy_weight,
        "huber": huber_weight,
    }
    k = kernels[base]

    def fn(r2):
        return k(r2, jnp.sqrt(mu) * delta)

    return fn


def _per_obs_blocks(state: BAState, problem: BAProblem, weight_fn: Callable):
    """(O,) residuals + weighted Jacobian products, as in ba.py but without
    the dense (C, P) coupling scatter."""
    q = state.poses.r.q.data[problem.cam_idx]
    t = state.poses.t[problem.cam_idx]
    X = state.points[problem.pt_idx]
    O = problem.cam_idx.shape[0]
    zeros6 = jnp.zeros((O, 6))
    zeros3 = jnp.zeros((O, 3))

    def res_and_jac(z6, z3, qq, tt, XX, uv):
        r = _residual_one(z6, z3, qq, tt, XX, uv, problem.K)
        Jc = jax.jacfwd(
            lambda d: _residual_one(d, z3, qq, tt, XX, uv, problem.K))(z6)
        Jp = jax.jacfwd(
            lambda d: _residual_one(z6, d, qq, tt, XX, uv, problem.K))(z3)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(res_and_jac)(zeros6, zeros3, q, t, X, problem.uv)
    r2 = jnp.sum(r * r, axis=-1)
    w = weight_fn(r2) * problem.valid.astype(r.dtype)
    sw = jnp.sqrt(w)[:, None, None]
    Jc = Jc * sw
    Jp = Jp * sw
    r_w = r * sw[..., 0]
    cost = jnp.sum(w * r2)
    return r_w, Jc, Jp, cost


def _sparse_lm_step(state, lam, problem, obs_idx, obs_mask, C, P,
                    weight_fn, fix_first_cam):
    r_w, Jc, Jp, cost = _per_obs_blocks(state, problem, weight_fn)

    H_cc = jax.ops.segment_sum(jnp.einsum("oki,okj->oij", Jc, Jc),
                               problem.cam_idx, num_segments=C)
    H_pp = jax.ops.segment_sum(jnp.einsum("oki,okj->oij", Jp, Jp),
                               problem.pt_idx, num_segments=P)
    b_c = jax.ops.segment_sum(jnp.einsum("oki,ok->oi", Jc, r_w),
                              problem.cam_idx, num_segments=C)
    b_p = jax.ops.segment_sum(jnp.einsum("oki,ok->oi", Jp, r_w),
                              problem.pt_idx, num_segments=P)
    W_obs = jnp.einsum("oki,okj->oij", Jc, Jp)  # (O, 6, 3)

    eye6 = jnp.eye(6, dtype=H_cc.dtype)
    eye3 = jnp.eye(3, dtype=H_pp.dtype)
    Hpp_inv = jnp.linalg.inv(H_pp + lam * eye3[None])  # (P, 3, 3)

    # per-point padded gathers
    m = obs_mask.astype(r_w.dtype)                      # (P, T)
    Wp = W_obs[obs_idx] * m[..., None, None]            # (P, T, 6, 3)
    cams = problem.cam_idx[obs_idx]                     # (P, T)
    WHinv = jnp.einsum("ptij,pjk->ptik", Wp, Hpp_inv)   # (P, T, 6, 3)

    # reduced camera system: scatter (P, T, T) camera-pair blocks
    S_pairs = jnp.einsum("ptik,psjk->ptsij", WHinv, Wp,
                         preferred_element_type=jnp.float32)  # (P,T,T,6,6)
    pair_idx = (cams[:, :, None] * C + cams[:, None, :]).reshape(-1)
    S_off = jax.ops.segment_sum(
        S_pairs.reshape(-1, 6, 6), pair_idx,
        num_segments=C * C).reshape(C, C, 6, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(H_cc + lam * eye6[None])

    # reduced rhs: b_c - sum_p WHinv_p b_p[p], scattered by camera
    rhs_obs = jnp.einsum("ptik,pk->pti", WHinv, b_p)    # (P, T, 6)
    rhs_red = jax.ops.segment_sum(rhs_obs.reshape(-1, 6),
                                  cams.reshape(-1), num_segments=C)
    rhs = b_c - rhs_red

    S_mat = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    rhs_vec = rhs.reshape(C * 6)
    if fix_first_cam:
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (C - 1))])
        S_mat = S_mat * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        rhs_vec = rhs_vec * mask
    L = jnp.linalg.cholesky(S_mat + 1e-8 * jnp.eye(C * 6, dtype=S_mat.dtype))
    y = jax.scipy.linalg.solve_triangular(L, rhs_vec, lower=True)
    dx_c = jax.scipy.linalg.solve_triangular(
        L.T, y, lower=False).reshape(C, 6)

    # back-substitution: dx_p = Hpp_inv (b_p - sum_t W_pt^T dx_c[cam_pt])
    Wt_dxc = jnp.einsum("ptij,pti->pj", Wp, dx_c[cams])
    dx_p = jnp.einsum("pij,pj->pi", Hpp_inv, b_p - Wt_dxc)
    return -dx_c, -dx_p, cost


@partial(jax.jit, static_argnames=("num_cameras", "num_points", "num_iters",
                                   "robust", "fix_first_cam", "gnc_stages"))
@f32_matmul_precision
def bundle_adjust_sparse(
    state: BAState,
    problem: BAProblem,
    obs_idx: jax.Array,
    obs_mask: jax.Array,
    num_cameras: int,
    num_points: int,
    num_iters: int = 10,
    init_lambda: float = 1e-3,
    robust_delta: float = 3.0,
    robust: str = "huber",
    fix_first_cam: bool = True,
    gnc_stages: int = 0,
) -> Tuple[BAState, jax.Array]:
    """LM bundle adjustment with sparse Schur assembly.

    obs_idx/obs_mask from `build_point_tables`. With `gnc_stages > 0` the
    robust kernel's scale is annealed over that many stages (graduated
    non-convexity) — required for the redescending kernels (tukey /
    geman_mcclure / welsch) when the init is far from the optimum.
    Returns (state, per-iteration costs (num_iters,) — with GNC,
    num_iters is the TOTAL and is split evenly across stages).
    """
    C, P = num_cameras, num_points

    def make_step(weight_fn):
        def step(carry, _):
            state, lam = carry
            dx_c, dx_p, cost = _sparse_lm_step(
                state, lam, problem, obs_idx, obs_mask, C, P, weight_fn,
                fix_first_cam)
            if fix_first_cam:
                dx_c = dx_c.at[0].set(0.0)
            new_state = _apply_step(state, dx_c, dx_p)
            new_cost = _per_obs_blocks(new_state, problem, weight_fn)[3]
            accept = new_cost < cost
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), new_state, state)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-8, 1e4)
            return (state, lam), jnp.where(accept, new_cost, cost)
        return step

    lam0 = jnp.asarray(init_lambda)
    if gnc_stages <= 0:
        kernels = {
            "huber": lambda r2: huber_weight(r2, robust_delta),
            "cauchy": lambda r2: cauchy_weight(r2, robust_delta),
            "geman_mcclure": lambda r2: geman_mcclure_weight(
                r2, robust_delta),
            "tukey": lambda r2: tukey_weight(r2, 3.0 * robust_delta),
            "welsch": lambda r2: welsch_weight(r2, robust_delta),
            "none": lambda r2: jnp.ones_like(r2),
        }
        (state, _), costs = jax.lax.scan(
            make_step(kernels[robust]), (state, lam0), None,
            length=num_iters)
        return state, costs

    # GNC: anneal mu geometrically from mu0 (quadratic-like) to 1 (target).
    # mu0 is set from the worst initial residual so the first stage treats
    # everything as inlier (Yang et al. 2020 §III-B).
    iters_per = max(num_iters // gnc_stages, 1)
    r0 = _per_obs_blocks(state, problem, jnp.ones_like)[0]
    r2max = jnp.max(jnp.sum(r0 * r0, -1))
    mu0 = jnp.clip(2.0 * r2max / (robust_delta * robust_delta), 2.0, 1e8)
    factor = mu0 ** (-1.0 / max(gnc_stages - 1, 1))
    costs_all = []
    lam = lam0
    for s in range(gnc_stages):
        mu = mu0 * factor ** s
        wfn = gnc_weight_fn(robust, robust_delta, mu)
        (state, lam), costs = jax.lax.scan(
            make_step(wfn), (state, lam), None, length=iters_per)
        costs_all.append(costs)
    return state, jnp.concatenate(costs_all)
