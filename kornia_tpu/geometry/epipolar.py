"""Epipolar geometry: fundamental / essential solvers, triangulation,
epipolar metrics (reference: kornia/geometry/epipolar/, 2.7k LoC).

TPU-first numerics (no f64 on chip):
  * All DLT systems run on Hartley-normalized coordinates.
  * The 5-point essential solver replaces the reference's companion-matrix
    eigendecomposition (epipolar/essential.py:45-195, needs nonsymmetric
    eig — unsupported by XLA:TPU) with a **hidden-variable resultant**:
    the 10 cubic constraints become a 10x10 matrix C(z) linear in the
    (x, y) monomials with entries polynomial in z; det C(z) is a degree-10
    polynomial whose coefficients we recover by evaluating the batched
    determinant at 11 fixed Chebyshev nodes and applying a precomputed
    inverse-Vandermonde — then roots come from the batched Durand-Kerner
    iteration in :mod:`kornia_tpu.geometry.solvers`. Everything is fixed
    shape, fixed trip count, vmap-able.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..core.check import check, check_shape
from ..core.dtype import as_float
from ..core.linalg import (gauss_det, inverse_3x3, lstsq_nullspace,
                           nullspace_inverse_iteration, nullspace_qr)
from .homography import normalize_points
from .solvers import multiply_deg_one_poly, multiply_deg_two_one_poly, poly_roots, solve_cubic

__all__ = [
    "run_8point",
    "run_7point",
    "run_5point",
    "polish_essential",
    "find_fundamental",
    "find_essential",
    "essential_from_fundamental",
    "fundamental_from_essential",
    "essential_from_Rt",
    "decompose_essential_matrix",
    "motion_from_essential",
    "motion_from_essential_choose_solution",
    "relative_camera_motion",
    "projection_from_KRt",
    "KRt_from_projection",
    "projections_from_fundamental",
    "fundamental_from_projections",
    "compute_correspond_epilines",
    "normalize_transformation",
    "triangulate_points",
    "sampson_epipolar_distance",
    "symmetrical_epipolar_distance",
    "left_to_right_epipolar_distance",
    "right_to_left_epipolar_distance",
]


def _to_homog(p: jax.Array) -> jax.Array:
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


# -----------------------------------------------------------------------------
# Fundamental matrix
# -----------------------------------------------------------------------------

@f32_matmul_precision
def run_8point(points1: jax.Array, points2: jax.Array,
               weights: Optional[jax.Array] = None) -> jax.Array:
    """Normalized 8-point algorithm (B, N≥8, 2) → (B, 3, 3)
    (reference: epipolar/fundamental.py:257)."""
    check_shape(points1, ["B", "N", "2"], "points1")
    points1 = as_float(points1)
    points2 = as_float(points2)
    p1n, T1 = normalize_points(points1)
    p2n, T2 = normalize_points(points2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    if weights is not None:
        A = A * jnp.sqrt(jnp.maximum(weights, 0.0))[..., None]
    if points1.shape[1] == 8:
        # minimal sample: exact 1-dim nullspace by Householder QR of Aᵀ
        # (eigh(AᵀA) squares the condition number; see nullspace_qr)
        f = nullspace_qr(A)[..., 0]
    else:
        f = lstsq_nullspace(A)
    F = f.reshape(-1, 3, 3)
    # rank-2 projection via SVD
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[..., 2].set(0.0)
    F = (U * S[..., None, :]) @ Vt
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F.reshape(-1, 9), axis=-1)[..., None, None]
    return F / jnp.maximum(norm, 1e-9)


def run_7point(points1: jax.Array, points2: jax.Array) -> jax.Array:
    """7-point algorithm → (B, 3, 3, 3) up to 3 solutions, zero-padded
    (reference: epipolar/fundamental.py:156)."""
    check_shape(points1, ["B", "7", "2"], "points1")
    points1 = as_float(points1)
    points2 = as_float(points2)
    B = points1.shape[0]
    p1n, T1 = normalize_points(points1)
    p2n, T2 = normalize_points(points2)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (B, 7, 9)
    # exact 2-dim nullspace by Householder QR of Aᵀ (eigh(AᵀA) squares the
    # condition number — see run_5point / core/linalg.py nullspace_qr)
    V = nullspace_qr(A)  # (B, 9, 2)
    F1 = V[..., :, 0].reshape(B, 3, 3)
    F2 = V[..., :, 1].reshape(B, 3, 3)
    # det(λ F1 + (1-λ) F2) = 0 → cubic in λ
    D = F1 - F2

    def det3(M):
        from ..core.linalg import det_3x3
        return det_3x3(M)

    # expand det(F2 + λ D) as cubic c3 λ³ + c2 λ² + c1 λ + c0 via evaluation
    # at 4 nodes and an exact inverse Vandermonde (λ = -1, 0, 1, 2)
    d_m1 = det3(F2 - D)
    d_0 = det3(F2)
    d_1 = det3(F2 + D)
    d_2 = det3(F2 + 2.0 * D)
    dvals = jnp.stack([d_m1, d_0, d_1, d_2], axis=-1)  # (B, 4)
    V_inv = jnp.array(
        np.linalg.inv(np.vander([-1.0, 0.0, 1.0, 2.0], 4)), dtype=points1.dtype
    )
    coeffs = dvals @ V_inv.T  # (B, 4): [c3, c2, c1, c0]
    lams = solve_cubic(coeffs)  # (B, 3)
    Fs = F2[:, None] + lams[..., None, None] * D[:, None]  # (B, 3, 3, 3)
    Fs = jnp.swapaxes(T2, -1, -2)[:, None] @ Fs @ T1[:, None]
    norm = jnp.maximum(jnp.abs(Fs[..., 2:3, 2:3]), 1e-9)
    Fs = Fs / jnp.where(Fs[..., 2:3, 2:3] >= 0, norm, -norm)
    return Fs


def find_fundamental(points1: jax.Array, points2: jax.Array,
                     weights: Optional[jax.Array] = None,
                     method: str = "8POINT") -> jax.Array:
    """(reference: epipolar/fundamental.py:330)."""
    if method.upper() == "8POINT":
        return run_8point(points1, points2, weights)
    if method.upper() == "7POINT":
        return run_7point(points1, points2)
    raise ValueError(f"unknown method {method}")


def normalize_transformation(M: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale so the last element is 1 (reference: fundamental.py)."""
    last = M[..., -1:, -1:]
    return M / (last + jnp.where(last >= 0, eps, -eps))


def compute_correspond_epilines(points: jax.Array, F: jax.Array) -> jax.Array:
    """Epipolar lines l' = F p for points (B, N, 2)
    (reference: fundamental.py compute_correspond_epilines)."""
    ph = _to_homog(as_float(points))
    lines = jnp.einsum("...ij,...nj->...ni", F, ph)
    n = jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True)
    return lines / jnp.maximum(n, 1e-9)


# -----------------------------------------------------------------------------
# Essential matrix — 5 point (hidden-variable resultant)
# -----------------------------------------------------------------------------

def _essential_constraints(E_basis: jax.Array) -> jax.Array:
    """Build the 10 cubic constraint polynomials for E = x E1 + y E2 + z E3 + E4.

    E_basis: (B, 4, 3, 3). Returns (B, 10, 20) coefficients in the monomial
    order produced by multiply_deg_two_one_poly.
    """
    # entry (i, j) of E is a degree-1 poly with coeffs (B, 4): [x, y, z, 1]
    e = jnp.moveaxis(E_basis, 1, -1)  # (B, 3, 3, 4)

    def d1_mul(i1, j1, i2, j2):
        return multiply_deg_one_poly(e[:, i1, j1], e[:, i2, j2])

    def d2_mul(p2, i, j):
        return multiply_deg_two_one_poly(p2, e[:, i, j])

    # det(E) = e00(e11 e22 - e12 e21) - e01(e10 e22 - e12 e20) + e02(e10 e21 - e11 e20)
    det = (
        d2_mul(d1_mul(1, 1, 2, 2) - d1_mul(1, 2, 2, 1), 0, 0)
        + d2_mul(d1_mul(1, 2, 2, 0) - d1_mul(1, 0, 2, 2), 0, 1)
        + d2_mul(d1_mul(1, 0, 2, 1) - d1_mul(1, 1, 2, 0), 0, 2)
    )  # (B, 20)

    # trace constraint: 2 E Eᵀ E - tr(E Eᵀ) E = 0 (9 equations)
    # EEt[i][j] = sum_k e[i,k] * e[j,k]  (degree 2)
    EEt = [[sum(d1_mul(i, k, j, k) for k in range(3)) for j in range(3)]
           for i in range(3)]
    tr = EEt[0][0] + EEt[1][1] + EEt[2][2]
    rows = []
    for i in range(3):
        for j in range(3):
            acc = sum(d2_mul(2.0 * EEt[i][k], k, j) for k in range(3))
            acc = acc - d2_mul(tr, i, j)
            rows.append(acc)
    constraints = jnp.stack([det] + rows, axis=1)  # (B, 10, 20)
    return constraints


# mapping from the 20-monomial order of multiply_deg_two_one_poly
#   [x³, x²y, x²z, x², xy², xyz, xy, xz², xz, x,
#    y³, y²z, y², yz², yz, y, z³, z², z, 1]
# to 10 (x,y)-monomial groups with z-polynomial coefficient indices
# (index lists are ordered z⁰, z¹, z², z³)
_GROUPS = [
    ("x3", [0]),
    ("x2y", [1]),
    ("xy2", [4]),
    ("y3", [10]),
    ("x2", [3, 2]),
    ("xy", [6, 5]),
    ("y2", [12, 11]),
    ("x", [9, 8, 7]),
    ("y", [15, 14, 13]),
    ("1", [19, 18, 17, 16]),
]

# 11 Chebyshev nodes on [-1, 1] and the inverse Vandermonde (f64 on host,
# embedded as constants) for recovering the degree-10 det polynomial
_NODES = np.cos((2 * np.arange(11) + 1) / 22.0 * np.pi)
_VAND_INV = np.linalg.inv(np.vander(_NODES, 11))  # coeffs: z^10 ... z^0



def _c_matrix_at(constraints: jax.Array, z: jax.Array,
                 reverse: bool = False) -> jax.Array:
    """Evaluate C(z): (B, 10, 20) coeffs → (B, 10, 10) for scalar z.

    With ``reverse=True``, evaluates the column-reversed matrix
    C̃(u) = diag-col(u^{d_j}) · C(1/u): det C̃(u) has roots u = 1/z, so
    interpolation on u ∈ [-1, 1] covers |z| ≥ 1 without extrapolation.
    """
    cols = []
    for _, idxs in _GROUPS:
        seq = list(reversed(idxs)) if reverse else idxs
        acc = constraints[..., seq[0]]
        zp = z
        for i in seq[1:]:
            acc = acc + constraints[..., i] * zp
            zp = zp * z
        cols.append(acc)
    return jnp.stack(cols, axis=-1)  # (B, 10, 10)


def _monomials3(x, y, z):
    """Degree-≤3 monomial vector in multiply_deg_two_one_poly order."""
    one = jnp.ones_like(x)
    return jnp.stack(
        [x * x * x, x * x * y, x * x * z, x * x, x * y * y, x * y * z, x * y,
         x * z * z, x * z, x, y * y * y, y * y * z, y * y, y * z * z, y * z,
         y, z * z * z, z * z, z, one], axis=-1)


def _polish_xyz(constraints: jax.Array, xs: jax.Array, ys: jax.Array,
                zs: jax.Array, iters: int = 6):
    """Damped Gauss-Newton on r(x,y,z) = C · mono(x,y,z), batched over all
    candidate roots. constraints: (B, 10, 20); xs/ys/zs: (B, R)."""

    def residual(c10x20, xyz):
        m = _monomials3(xyz[0], xyz[1], xyz[2])
        return c10x20 @ m  # (10,)

    def polish_one(c10x20, x, y, z):
        xyz = jnp.stack([x, y, z])

        trust = 0.05 * (1.0 + jnp.linalg.norm(xyz))

        def body(xyz, _):
            r = residual(c10x20, xyz)
            J = jax.jacfwd(lambda p: residual(c10x20, p))(xyz)  # (10, 3)
            JtJ = J.T @ J + 1e-10 * jnp.eye(3, dtype=xyz.dtype)
            # closed-form 3x3 inverse: XLA's batched LU solve loops are
            # ~100x slower for 409k tiny systems on TPU
            step = inverse_3x3(JtJ[None])[0] @ (J.T @ r)
            # trust region: refine within the seed's root basin only —
            # unbounded GN can jump to another of the <=10 solutions and
            # collapse distinct candidates (losing the true model)
            mag = jnp.linalg.norm(step)
            step = jnp.where(mag > trust, step * (trust / mag), step)
            new = xyz - step
            better = jnp.sum(residual(c10x20, new) ** 2) < jnp.sum(r**2)
            return jnp.where(better, new, xyz), None

        xyz, _ = jax.lax.scan(body, xyz, None, length=iters)
        return xyz

    out = jax.vmap(
        lambda c, xb, yb, zb: jax.vmap(lambda x, y, z: polish_one(c, x, y, z))(
            xb, yb, zb)
    )(constraints, xs, ys, zs)  # (B, R, 3)
    return out[..., 0], out[..., 1], out[..., 2]


@f32_matmul_precision
def run_5point(points1: jax.Array, points2: jax.Array,
               weights: Optional[jax.Array] = None) -> jax.Array:
    """Nistér-style 5-point essential solver → (B, 20, 3, 3), zero-padded
    (up to 10 true solutions; 20 polished candidates are returned and
    invalid ones zeroed — reference: epipolar/essential.py:45). See module
    docstring for the TPU-native root-finding strategy."""
    check_shape(points1, ["B", "N", "2"], "points1")
    points1 = as_float(points1)
    points2 = as_float(points2)
    B, N, _ = points1.shape
    x1, y1 = points1[..., 0], points1[..., 1]
    x2, y2 = points2[..., 0], points2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (B, N, 9)
    if weights is not None:
        A = A * jnp.sqrt(jnp.maximum(weights, 0.0))[..., None]
    if N == 5:
        # exact 4-dim nullspace by Householder QR of Aᵀ — eigh(AᵀA)
        # squares the condition number and, in f32, loses the true E from
        # the span on near-degenerate samples (worst-case span residual
        # 4e-1 → 4e-5; see core/linalg.py nullspace_qr)
        V = nullspace_qr(A)  # (B, 9, 4)
        E_basis = jnp.moveaxis(V, -1, 1).reshape(B, 4, 3, 3)
    else:
        # overdetermined: 4 smallest eigenvectors of AᵀA
        AtA = jnp.einsum("bni,bnj->bij", A, A)
        _, vecs = jnp.linalg.eigh(AtA)
        E_basis = jnp.moveaxis(vecs[..., :, :4], -1, 1).reshape(B, 4, 3, 3)

    constraints = _essential_constraints(E_basis)  # (B, 10, 20)
    # normalize rows for conditioning
    row_norm = jnp.maximum(
        jnp.linalg.norm(constraints, axis=-1, keepdims=True), 1e-12)
    constraints = constraints / row_norm

    # det C(z) at the 11 Chebyshev nodes → degree-10 coefficients; twice:
    # forward for |z| <= 1 and column-reversed for |z| >= 1 (u = 1/z), so
    # no f32 extrapolation of the interpolant is ever needed.
    vinv = jnp.asarray(_VAND_INV, points1.dtype)

    def det_coeffs(reverse):
        # gauss_det: unrolled GE — XLA's batched LU det is ~10x slower on
        # TPU for these tiny 10x10 systems
        dets = [
            gauss_det(
                _c_matrix_at(constraints, jnp.asarray(zk, points1.dtype), reverse))
            for zk in _NODES
        ]
        return jnp.stack(dets, axis=-1) @ vinv.T  # (B, 11): z^10 ... z^0

    # residual-gated Durand-Kerner: the batch converges in ~25-40 trips,
    # not the worst-case 100 (the downstream GN polish absorbs the last
    # f32 digit anyway — 1e-5 in balanced coords is below its seed noise)
    roots_fwd = poly_roots(det_coeffs(False), tol=1e-5)  # roots z
    roots_rev = poly_roots(det_coeffs(True), tol=1e-5)  # roots u = 1/z
    u = roots_rev
    inv_u = 1.0 / jnp.where(jnp.abs(u) > 1e-4, u, 1e-4)
    # every root's real part seeds the Gauss-Newton polish below (f32 noise
    # can push real roots slightly off-axis); validity is judged AFTER
    # polishing by the constraint residual. Forward roots cover |z|<=1,
    # reversed roots cover |z|>=1 → 20 candidates.
    z_fwd = jnp.clip(roots_fwd.real, -1.5, 1.5)
    u_rev = u.real

    # (x, y) from the nullspace of C(z) (forward) or C̃(u) (reversed —
    # bounded entries even for huge |z|; its null vector is m_j·u^{-d_j}
    # with column degrees d_x=2, d_1=3, so m̃_x/m̃_1 = x·u and
    # x = (m̃_x/m̃_1)/u)
    def solve_root(constraints_b, v, reverse):
        Cv = _c_matrix_at(constraints_b[None], v, reverse)[0]  # (10, 10)
        # inverse iteration instead of eigh: batched 10x10 eigh dominated
        # the whole solver (~5.8 s for 409k matrices on a v5e); the null
        # vector only seeds the Gauss-Newton polish below
        m = nullspace_inverse_iteration(Cv)  # (10,)
        w = m[9]
        w_safe = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
        x = m[7] / w_safe
        y = m[8] / w_safe
        if reverse:
            v_safe = jnp.where(jnp.abs(v) > 1e-6, v, 1e-6)
            return x / v_safe, y / v_safe
        return x, y

    xs_f, ys_f = jax.vmap(
        lambda cb, zs: jax.vmap(lambda z: solve_root(cb, z, False))(zs)
    )(constraints, z_fwd)
    xs_r, ys_r = jax.vmap(
        lambda cb, us: jax.vmap(lambda uu: solve_root(cb, uu, True))(us)
    )(constraints, u_rev)
    xs = jnp.concatenate([xs_f, xs_r], axis=-1)
    ys = jnp.concatenate([ys_f, ys_r], axis=-1)
    z_roots = jnp.concatenate([z_fwd, inv_u.real], axis=-1)  # (B, 20)

    # Gauss-Newton polish of (x, y, z) on the 10 cubic constraints —
    # recovers the f32 precision lost in det-interpolation + root finding
    xs, ys, z_roots = _polish_xyz(constraints, xs, ys, z_roots, iters=6)

    E = (
        xs[..., None, None] * E_basis[:, None, 0]
        + ys[..., None, None] * E_basis[:, None, 1]
        + z_roots[..., None, None] * E_basis[:, None, 2]
        + E_basis[:, None, 3]
    )  # (B, 20, 3, 3)
    R_cand = E.shape[1]
    norm = jnp.maximum(
        jnp.linalg.norm(E.reshape(B, R_cand, 9), axis=-1)[..., None, None], 1e-12)
    E = E / norm
    # validity: post-polish constraint residual (scale-invariant since both
    # constraints and (x,y,z) are polished in the normalized basis)
    mono = _monomials3(xs, ys, z_roots)  # (B, R, 20)
    resid = jnp.einsum("bce,bre->brc", constraints, mono)  # (B, R, 10)
    scale2 = (1.0 + xs**2 + ys**2 + z_roots**2) ** 3
    r2 = jnp.sum(resid**2, axis=-1)
    ok = r2 < 1e-6 * scale2
    # never return an all-zero candidate set: the lowest-residual candidate
    # survives even when the f32 threshold rejects everything (~0.2% of
    # minimal samples); downstream RANSAC scoring / cheirality culls it if
    # it is genuinely bad, and `polish_essential` can recover it.
    best = jnp.argmin(r2 / scale2, axis=-1)
    ok = ok.at[jnp.arange(B), best].set(True)
    E = jnp.where(ok[..., None, None], E, 0.0)
    return E


def _hat(t: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross matrix."""
    z = jnp.zeros_like(t[..., 0])
    return jnp.stack([
        jnp.stack([z, -t[..., 2], t[..., 1]], -1),
        jnp.stack([t[..., 2], z, -t[..., 0]], -1),
        jnp.stack([-t[..., 1], t[..., 0], z], -1)], -2)


def _exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues: (3,) tangent -> (3, 3) rotation (f32-safe small-angle)."""
    th2 = jnp.sum(w * w)
    th = jnp.sqrt(th2 + 1e-24)
    K = _hat(w) / th
    s, c = jnp.sin(th), jnp.cos(th)
    R = jnp.eye(3, dtype=w.dtype) + s * K + (1.0 - c) * (K @ K)
    return jnp.where(th2 > 1e-12, R, jnp.eye(3, dtype=w.dtype) + _hat(w))


def polish_essential(E: jax.Array, points1: jax.Array, points2: jax.Array,
                     iters: int = 3,
                     weights: Optional[jax.Array] = None) -> jax.Array:
    """Newton polish of essential candidates ON THE (R, t) MANIFOLD.

    Closes the ~1% f32 tail of `run_5point` (det-interpolation +
    Durand-Kerner noise): each candidate is decomposed to (R, t), then
    Gauss-Newton over the 5-dof tangent (3 rotation + 2 on the t-sphere)
    minimizes the epipolar residuals x2^T [t]x R x1 — the essential
    constraints hold by construction. Zero (invalid) candidates pass
    through unchanged; a polished candidate is only accepted if its mean
    squared epipolar residual decreased.

    E: (B, R, 3, 3) candidates (unit Frobenius, zeros = invalid);
    points1/2: (B, N, 2) normalized image coordinates.
    `weights` (B, N) optionally down-weights residuals (e.g. a RANSAC
    inlier mask) — used for robust local optimization.
    Returns (B, R, 3, 3).
    """
    E = as_float(E)
    p1 = _to_homog(as_float(points1))  # (B, N, 3)
    p2 = _to_homog(as_float(points2))
    B, R_cand = E.shape[:2]
    if weights is None:
        sqw = jnp.ones(p1.shape[:2], E.dtype)
    else:
        sqw = jnp.sqrt(jnp.maximum(as_float(weights), 0.0))
    valid = jnp.sum(jnp.abs(E), (-1, -2)) > 1e-8  # (B, R)

    R1, _R2, t0 = decompose_essential_matrix(
        jnp.where(valid[..., None, None], E,
                  jnp.eye(3, dtype=E.dtype)))  # (B, R, 3, 3), (B, R, 3, 1)

    def res_fn(Rm, tm, x1, x2, sw):
        Em = _hat(tm) @ Rm
        return sw * jnp.einsum("ni,ij,nj->n", x2, Em, x1)

    def polish_one(Rm, t, x1, x2, sw):
        t = t[..., 0]

        def body(carry, _):
            Rm, t = carry
            # orthonormal basis of the tangent plane at t
            e = jnp.eye(3, dtype=t.dtype)[jnp.argmin(jnp.abs(t))]
            b1 = jnp.cross(t, e)
            b1 = b1 / jnp.linalg.norm(b1)
            b2 = jnp.cross(t, b1)

            def res(d):
                Rn = _exp_so3(d[:3]) @ Rm
                tn = t + b1 * d[3] + b2 * d[4]
                tn = tn / jnp.linalg.norm(tn)
                return res_fn(Rn, tn, x1, x2, sw)

            z = jnp.zeros(5, dtype=t.dtype)
            r = res(z)
            J = jax.jacfwd(res)(z)  # (N, 5)
            JtJ = J.T @ J + 1e-8 * jnp.eye(5, dtype=t.dtype)
            d = -jnp.linalg.solve(JtJ, J.T @ r)
            Rn = _exp_so3(d[:3]) @ Rm
            tn = t + b1 * d[3] + b2 * d[4]
            tn = tn / jnp.linalg.norm(tn)
            better = jnp.sum(res_fn(Rn, tn, x1, x2, sw) ** 2) < jnp.sum(r * r)
            Rm = jnp.where(better, Rn, Rm)
            t = jnp.where(better, tn, t)
            return (Rm, t), None

        (Rm, t), _ = jax.lax.scan(body, (Rm, t), None, length=iters)
        return _hat(t) @ Rm / jnp.sqrt(2.0).astype(t.dtype)

    E_pol = jax.vmap(  # over batch
        jax.vmap(polish_one, in_axes=(0, 0, None, None, None))
    )(R1, t0, p1, p2, sqw)

    # accept only genuine improvements (and keep invalid slots zero)
    def msr(Em):
        r = sqw[:, None, :] * jnp.einsum("bni,brij,bnj->brn", p2, Em, p1)
        return jnp.mean(r * r, -1)

    better = msr(E_pol) < msr(E)
    keep = valid & better
    return jnp.where(keep[..., None, None], E_pol, E)


def find_essential(points1: jax.Array, points2: jax.Array,
                   weights: Optional[jax.Array] = None) -> jax.Array:
    """(reference: epipolar/essential.py:748)."""
    return run_5point(points1, points2, weights)


def essential_from_fundamental(F: jax.Array, K1: jax.Array, K2: jax.Array
                               ) -> jax.Array:
    """E = K2ᵀ F K1 (reference: essential.py:526)."""
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


def fundamental_from_essential(E: jax.Array, K1: jax.Array, K2: jax.Array
                               ) -> jax.Array:
    """F = K2⁻ᵀ E K1⁻¹ (reference: fundamental.py fundamental_from_essential)."""
    return jnp.swapaxes(inverse_3x3(K2), -1, -2) @ E @ inverse_3x3(K1)


def essential_from_Rt(R1: jax.Array, t1: jax.Array, R2: jax.Array,
                      t2: jax.Array) -> jax.Array:
    """E from two world-to-camera poses (reference: essential.py:554)."""
    R, t = relative_camera_motion(R1, t1, R2, t2)
    from .conversions import vector_to_skew_symmetric_matrix
    Tx = vector_to_skew_symmetric_matrix(t[..., 0])
    return Tx @ R


def relative_camera_motion(R1: jax.Array, t1: jax.Array, R2: jax.Array,
                           t2: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(R, t) of camera 2 w.r.t. camera 1 (reference: essential.py:714)."""
    R = R2 @ jnp.swapaxes(R1, -1, -2)
    t = t2 - R @ t1
    return R, t


def decompose_essential_matrix(E: jax.Array
                               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """E → (R1, R2, t) candidates via SVD (reference: essential.py:442)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    det_u = jnp.linalg.det(U)[..., None, None]
    det_v = jnp.linalg.det(Vt)[..., None, None]
    U = U * jnp.where(det_u < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(det_v < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2:3]
    return R1, R2, t


def motion_from_essential(E: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """All 4 (R, t) candidates (B, 4, 3, 3), (B, 4, 3, 1)
    (reference: essential.py:583)."""
    R1, R2, t = decompose_essential_matrix(E)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-3)
    return Rs, ts


def decompose_homography_matrix(H: jax.Array
                                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decompose a CALIBRATED homography (normalized coords,
    H = R + t nᵀ / d) into 4 (R, t, n) candidates — Faugeras SVD method.
    (New vs the reference — kornia has no homography decomposition; needed
    for planar-scene odometry where the essential matrix degenerates.)

    H: (B, 3, 3) → (R (B, 4, 3, 3), t (B, 4, 3, 1), n (B, 4, 3, 1)).
    """
    U, D, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = D[..., 0], D[..., 1], D[..., 2]
    # normalize so the middle singular value is 1
    Hn_scale = d2[..., None, None]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1 = d1 / d2
    d3 = d3 / d2
    denom = jnp.maximum(d1 - d3, 1e-9)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - 1.0) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3 = jnp.sqrt(jnp.maximum((1.0 - d3 * d3) / jnp.maximum(
        d1 * d1 - d3 * d3, 1e-12), 0.0))
    sin_t = jnp.sqrt(jnp.maximum(
        (d1 * d1 - 1.0) * (1.0 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3), 1e-9)
    cos_t = (1.0 + d1 * d3) / jnp.maximum(d1 + d3, 1e-9)
    Rs, ts, ns = [], [], []
    V = jnp.swapaxes(Vt, -1, -2)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.zeros_like(H)
            Rp = Rp.at[..., 0, 0].set(cos_t).at[..., 0, 2].set(-st)
            Rp = Rp.at[..., 1, 1].set(1.0)
            Rp = Rp.at[..., 2, 0].set(st).at[..., 2, 2].set(cos_t)
            tp = jnp.stack([e1 * x1, jnp.zeros_like(x1), -e3 * x3],
                           axis=-1)[..., None] * (d1 - d3)[..., None, None]
            np_ = jnp.stack([e1 * x1, jnp.zeros_like(x1), e3 * x3],
                            axis=-1)[..., None]
            R = s[..., None, None] * U @ Rp @ Vt
            t = U @ tp
            n = V @ np_
            # orient the plane normal toward the camera (n_z > 0)
            flip = jnp.sign(n[..., 2, 0] + 1e-12)[..., None, None]
            n = n * flip
            t = t * flip
            Rs.append(R)
            ts.append(t)
            ns.append(n)
    return (jnp.stack(Rs, axis=-3 - 0).reshape(*H.shape[:-2], 4, 3, 3),
            jnp.stack(ts, axis=-3).reshape(*H.shape[:-2], 4, 3, 1),
            jnp.stack(ns, axis=-3).reshape(*H.shape[:-2], 4, 3, 1))


def motion_from_homography_choose_solution(
    H: jax.Array, x1: jax.Array, x2: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick the cheirality-consistent (R, t, n) from the 4 homography
    decompositions by triangulated in-front counts. Coordinates are
    normalized (calibrated)."""
    Rs, ts, ns = decompose_homography_matrix(H)
    B = H.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=H.dtype), (B, 3, 3))
    zero = jnp.zeros((B, 3, 1), H.dtype)
    P1 = jnp.concatenate([eye, zero], axis=-1)
    counts = []
    for i in range(4):
        P2 = jnp.concatenate([Rs[:, i], ts[:, i]], axis=-1)
        X = triangulate_points(P1, P2, x1, x2)
        d1_ = X[..., 2]
        X2 = jnp.einsum("bij,bnj->bni", Rs[:, i], X) + ts[:, i][..., 0][:, None]
        ok = (d1_ > 0) & (X2[..., 2] > 0)
        if mask is not None:
            ok = ok & mask
        counts.append(jnp.sum(ok, axis=-1))
    counts = jnp.stack(counts, axis=-1)
    best = jnp.argmax(counts, axis=-1)
    Rb = jnp.take_along_axis(Rs, best[:, None, None, None], axis=1)[:, 0]
    tb = jnp.take_along_axis(ts, best[:, None, None, None], axis=1)[:, 0]
    nb = jnp.take_along_axis(ns, best[:, None, None, None], axis=1)[:, 0]
    return Rb, tb, nb


@f32_matmul_precision
def motion_from_essential_choose_solution(
    E: jax.Array, K1: jax.Array, K2: jax.Array,
    x1: jax.Array, x2: jax.Array, mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Choose the cheirality-correct (R, t) by triangulating (reference:
    essential.py:609). Returns (R, t, X_3d)."""
    Rs, ts = motion_from_essential(E)  # (B, 4, 3, 3), (B, 4, 3, 1)
    B = E.shape[0]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=E.dtype), (B, 3, 3))
    zero_t = jnp.zeros((B, 3, 1), dtype=E.dtype)
    P1 = projection_from_KRt(K1, eye, zero_t)  # (B, 3, 4)

    def count_in_front(R, t):
        P2 = projection_from_KRt(K2, R, t)
        X = triangulate_points(P1, P2, x1, x2)  # (B, N, 3)
        d1 = X[..., 2]
        X2 = jnp.einsum("bij,bnj->bni", R, X) + t[..., 0][:, None, :]
        d2 = X2[..., 2]
        ok = (d1 > 0) & (d2 > 0)
        if mask is not None:
            ok = ok & mask
        return jnp.sum(ok, axis=-1), X

    counts = []
    Xs = []
    for i in range(4):
        c, X = count_in_front(Rs[:, i], ts[:, i])
        counts.append(c)
        Xs.append(X)
    counts = jnp.stack(counts, axis=-1)  # (B, 4)
    best = jnp.argmax(counts, axis=-1)  # (B,)
    Rbest = jnp.take_along_axis(Rs, best[:, None, None, None], axis=1)[:, 0]
    tbest = jnp.take_along_axis(ts, best[:, None, None, None], axis=1)[:, 0]
    Xstack = jnp.stack(Xs, axis=1)  # (B, 4, N, 3)
    Xbest = jnp.take_along_axis(
        Xstack, best[:, None, None, None], axis=1)[:, 0]
    return Rbest, tbest, Xbest


# -----------------------------------------------------------------------------
# Projections
# -----------------------------------------------------------------------------

def projection_from_KRt(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """P = K [R | t] (reference: projection.py:101)."""
    Rt = jnp.concatenate([R, t], axis=-1)
    return K @ Rt


def KRt_from_projection(P: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RQ-decompose P → (K, R, t) (reference: projection.py:131).

    Implemented with QR of the flipped submatrix (no dedicated RQ in jnp)."""
    M = P[..., :3]
    # RQ via QR: reverse rows/cols trick
    perm = jnp.array([2, 1, 0])
    M_flip = M[..., perm, :]
    Q_, R_ = jnp.linalg.qr(jnp.swapaxes(M_flip, -1, -2))
    K = jnp.swapaxes(R_, -1, -2)[..., perm, :][..., :, perm]
    R = jnp.swapaxes(Q_, -1, -2)[..., perm, :]
    # make diagonal of K positive
    sign = jnp.sign(jnp.diagonal(K, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    K = K * sign[..., None, :]
    R = R * sign[..., :, None]
    t = jnp.linalg.solve(K, P[..., :, 3:4])
    K = K / jnp.maximum(K[..., 2:3, 2:3], 1e-9)
    return K, R, t


def fundamental_from_projections(P1: jax.Array, P2: jax.Array) -> jax.Array:
    """F from two projection matrices via 2x2 minors
    (reference: fundamental.py:476)."""
    # rows
    X1 = P1[..., [1, 2], :]
    X2 = P1[..., [2, 0], :]
    X3 = P1[..., [0, 1], :]
    Y1 = P2[..., [1, 2], :]
    Y2 = P2[..., [2, 0], :]
    Y3 = P2[..., [0, 1], :]

    def det4(X, Y):
        M = jnp.concatenate([X, Y], axis=-2)  # (..., 4, 4)
        return jnp.linalg.det(M)

    rows = []
    for Y in (Y1, Y2, Y3):
        rows.append(jnp.stack([det4(X1, Y), det4(X2, Y), det4(X3, Y)], axis=-1))
    return jnp.stack(rows, axis=-2)


def projections_from_fundamental(F: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Canonical projection pair (P1, P2) from F
    (reference: projection.py projections_from_fundamental)."""
    B = F.shape[0]
    P1 = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3, dtype=F.dtype),
                         jnp.zeros((3, 1), F.dtype)], axis=-1), (B, 3, 4))
    # epipole e' = null(Fᵀ)
    e2 = lstsq_nullspace(jnp.swapaxes(F, -1, -2))  # (B, 3)
    from .conversions import vector_to_skew_symmetric_matrix
    e2x = vector_to_skew_symmetric_matrix(e2)
    P2 = jnp.concatenate([e2x @ F, e2[..., :, None]], axis=-1)
    return P1, P2


# -----------------------------------------------------------------------------
# Triangulation
# -----------------------------------------------------------------------------

@f32_matmul_precision
def triangulate_points(P1: jax.Array, P2: jax.Array, points1: jax.Array,
                       points2: jax.Array) -> jax.Array:
    """Batched DLT triangulation (reference: triangulation.py:59).

    P1, P2: (B, 3, 4); points: (B, N, 2) → (B, N, 3)."""
    points1 = as_float(points1)
    points2 = as_float(points2)

    def rows(P, pts):
        # x * P[2] - P[0], y * P[2] - P[1]
        r0 = pts[..., 0:1] * P[..., None, 2, :] - P[..., None, 0, :]
        r1 = pts[..., 1:2] * P[..., None, 2, :] - P[..., None, 1, :]
        return r0, r1

    a0, a1 = rows(P1, points1)
    a2, a3 = rows(P2, points2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (B, N, 4, 4)
    # row-normalize for conditioning, then the smallest right singular
    # vector by INVERSE ITERATION — XLA's batched eigh runs sequential
    # Jacobi sweeps on TPU (the 5-point solver measured ~14 us per 10x10
    # matrix; 4 cheirality candidates x N points of 4x4 eighs made pose
    # selection a visible slice of the two-view pipeline)
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-9)
    X_h = nullspace_inverse_iteration(A, iters=3)
    w = X_h[..., 3:]
    return X_h[..., :3] / (w + jnp.where(w >= 0, 1e-9, -1e-9))


# -----------------------------------------------------------------------------
# Epipolar metrics (reference: epipolar/_metrics.py)
# -----------------------------------------------------------------------------

def sampson_epipolar_distance(pts1: jax.Array, pts2: jax.Array, Fm: jax.Array,
                              squared: bool = True, eps: float = 1e-8) -> jax.Array:
    """First-order geometric error (reference: _metrics.py sampson)."""
    p1 = _to_homog(as_float(pts1))
    p2 = _to_homog(as_float(pts2))
    F_t = jnp.swapaxes(Fm, -1, -2)
    line1_in_2 = jnp.einsum("...ij,...nj->...ni", Fm, p1)
    line2_in_1 = jnp.einsum("...ij,...nj->...ni", F_t, p2)
    numerator = jnp.sum(p2 * line1_in_2, axis=-1) ** 2
    denominator = (
        line1_in_2[..., 0] ** 2 + line1_in_2[..., 1] ** 2
        + line2_in_1[..., 0] ** 2 + line2_in_1[..., 1] ** 2
    )
    out = numerator / jnp.maximum(denominator, eps)
    return out if squared else jnp.sqrt(out + eps)


def symmetrical_epipolar_distance(pts1: jax.Array, pts2: jax.Array,
                                  Fm: jax.Array, squared: bool = True,
                                  eps: float = 1e-8) -> jax.Array:
    """(reference: _metrics.py symmetrical)."""
    p1 = _to_homog(as_float(pts1))
    p2 = _to_homog(as_float(pts2))
    F_t = jnp.swapaxes(Fm, -1, -2)
    line1_in_2 = jnp.einsum("...ij,...nj->...ni", Fm, p1)
    line2_in_1 = jnp.einsum("...ij,...nj->...ni", F_t, p2)
    numerator = jnp.sum(p2 * line1_in_2, axis=-1) ** 2
    denominator_inv = (
        1.0 / jnp.maximum(line1_in_2[..., 0] ** 2 + line1_in_2[..., 1] ** 2, eps)
        + 1.0 / jnp.maximum(line2_in_1[..., 0] ** 2 + line2_in_1[..., 1] ** 2, eps)
    )
    out = numerator * denominator_inv
    return out if squared else jnp.sqrt(out + eps)


def left_to_right_epipolar_distance(pts1: jax.Array, pts2: jax.Array,
                                    Fm: jax.Array) -> jax.Array:
    """Point-to-line distance of p2 from F p1 (reference: _metrics.py)."""
    p1 = _to_homog(as_float(pts1))
    p2 = _to_homog(as_float(pts2))
    line1_in_2 = jnp.einsum("...ij,...nj->...ni", Fm, p1)
    num = jnp.abs(jnp.sum(p2 * line1_in_2, axis=-1))
    den = jnp.sqrt(line1_in_2[..., 0] ** 2 + line1_in_2[..., 1] ** 2 + 1e-12)
    return num / den


def right_to_left_epipolar_distance(pts1: jax.Array, pts2: jax.Array,
                                    Fm: jax.Array) -> jax.Array:
    return left_to_right_epipolar_distance(pts2, pts1, jnp.swapaxes(Fm, -1, -2))


# -----------------------------------------------------------------------------
# projection / intrinsics helpers + epipolar-line geometry
# (reference: epipolar/projection.py, epipolar/fundamental.py:393-448,
#  epipolar/numeric.py, epipolar/essential.py:485)
# -----------------------------------------------------------------------------

def cross_product_matrix(x: jax.Array) -> jax.Array:
    """(..., 3) → (..., 3, 3) skew matrix (reference: numeric.py:25)."""
    from .conversions import vector_to_skew_symmetric_matrix
    return vector_to_skew_symmetric_matrix(x)


def intrinsics_like(focal: float, input: jax.Array) -> jax.Array:
    """(B, 3, 3) intrinsics with the principal point at the center of the
    (B, C, H, W) input (reference: projection.py:32)."""
    check(input.ndim == 4, f"expected (B, C, H, W), got {input.shape}")
    check(focal > 0, f"focal must be positive, got {focal}")
    B, _, H, W = input.shape
    K = jnp.array([[focal, 0.0, W / 2.0],
                   [0.0, focal, H / 2.0],
                   [0.0, 0.0, 1.0]], as_float(input).dtype)
    return jnp.broadcast_to(K, (B, 3, 3))


def random_intrinsics(low, high, key: Optional[jax.Array] = None
                      ) -> jax.Array:
    """(1, 3, 3) intrinsics with fx/fy/cx/cy ~ U[low, high)
    (reference: projection.py:61 — JAX takes an explicit PRNG key)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    fx, fy, cx, cy = jax.random.uniform(
        key, (4,), minval=low, maxval=high)
    z, o = jnp.zeros(()), jnp.ones(())
    return jnp.stack([fx, z, cx, z, fy, cy, z, z, o]).reshape(1, 3, 3)


def scale_intrinsics(camera_matrix: jax.Array, scale_factor) -> jax.Array:
    """Scale focal lengths and principal point (reference: projection.py:79)."""
    K = as_float(camera_matrix)
    s = jnp.asarray(scale_factor, K.dtype)
    # fx, fy, cx, cy scale; skew/last row don't
    mask = jnp.zeros((3, 3), K.dtype)
    mask = mask.at[0, 0].set(1.0).at[1, 1].set(1.0)
    mask = mask.at[0, 2].set(1.0).at[1, 2].set(1.0)
    if s.ndim:
        s = s[..., None, None]
    return K * ((s - 1.0) * mask + 1.0)


def projection_from_Rt(rmat: jax.Array, tvec: jax.Array) -> jax.Array:
    """P = [R | t] (reference: projection.py — imgwarp.py:1021)."""
    check(rmat.shape[-2:] == (3, 3), f"R must be (*, 3, 3), got {rmat.shape}")
    check(tvec.shape[-2:] == (3, 1), f"t must be (*, 3, 1), got {tvec.shape}")
    return jnp.concatenate([as_float(rmat), as_float(tvec)], axis=-1)


def depth_from_point(R: jax.Array, t: jax.Array, X: jax.Array) -> jax.Array:
    """Depth (z in camera frame) of world points under [R|t]
    (reference: projection.py:167)."""
    Xc = R @ jnp.swapaxes(as_float(X), -2, -1)
    return Xc[..., 2, :] + t[..., 2, :]


def get_perpendicular(lines: jax.Array, points: jax.Array) -> jax.Array:
    """Line through each point perpendicular to the given line
    (homogeneous (a, b, c); reference: fundamental.py:393)."""
    check_shape(lines, ["*", "N", "3"], "lines")
    if points.shape[-1] == 2:
        points = _to_homog(as_float(points))
    infinity_point = lines * jnp.array([1.0, 1.0, 0.0], lines.dtype)
    return jnp.cross(points, infinity_point, axis=-1)


def get_closest_point_on_epipolar_line(pts1: jax.Array, pts2: jax.Array,
                                       Fm: jax.Array) -> jax.Array:
    """Foot of the perpendicular from pts2 onto the epipolar line of pts1
    (reference: fundamental.py:419)."""
    from .conversions import convert_points_from_homogeneous
    if pts1.shape[-1] == 2:
        pts1 = _to_homog(as_float(pts1))
    if pts2.shape[-1] == 2:
        pts2 = _to_homog(as_float(pts2))
    line1in2 = compute_correspond_epilines(pts1[..., :2], Fm)
    perp = get_perpendicular(line1in2, pts2)
    return convert_points_from_homogeneous(
        jnp.cross(line1in2, perp, axis=-1))


def matrix_cofactor_tensor(M: jax.Array) -> jax.Array:
    """Cofactor matrix C = det(M)·M⁻ᵀ of (*, 3, 3) inputs, via cross
    products of columns — works for singular matrices like E, unlike the
    reference's inverse-based route (numeric.py:49)."""
    c0 = jnp.cross(M[..., 1], M[..., 2], axis=-1)
    c1 = jnp.cross(M[..., 2], M[..., 0], axis=-1)
    c2 = jnp.cross(M[..., 0], M[..., 1], axis=-1)
    return jnp.stack([c0, c1, c2], axis=-1)


def decompose_essential_matrix_no_svd(E_mat: jax.Array
                                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """SVD-free (R1, R2, t) recovery from E — Horn (1990) baseline/orientation
    formulas (reference: essential.py:485). TPU-friendly: cross products +
    one argmax instead of an SVD."""
    check(E_mat.shape[-2:] == (3, 3), f"E must be (*, 3, 3), got {E_mat.shape}")
    E = as_float(E_mat).reshape(-1, 3, 3)
    e1, e2, e3 = E[..., 0], E[..., 1], E[..., 2]
    scale = jnp.sqrt(0.5 * jnp.sum(E * E, axis=(-1, -2)))
    crosses = jnp.stack([jnp.cross(e1, e2, axis=-1),
                         jnp.cross(e2, e3, axis=-1),
                         jnp.cross(e3, e1, axis=-1)], axis=1)  # (B, 3, 3)
    norms = jnp.linalg.norm(crosses, axis=-1, keepdims=True)
    largest = jnp.argmax(norms[..., 0], axis=-1)
    scaled = scale[:, None, None] * crosses / jnp.maximum(norms, 1e-12)
    b1 = jnp.take_along_axis(scaled, largest[:, None, None].repeat(3, -1),
                             axis=1)[:, 0]  # (B, 3)
    b1_unit = b1 / jnp.maximum(
        jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    B1 = cross_product_matrix(b1)
    bb = jnp.sum(b1 * b1, axis=-1)[:, None, None]
    cof = matrix_cofactor_tensor(E)
    R1 = (cof - B1 @ E) / jnp.maximum(bb, 1e-12)
    R2 = (cof - (-B1) @ E) / jnp.maximum(bb, 1e-12)
    return R1, R2, b1_unit[..., None]


__all__ += [
    "cross_product_matrix", "intrinsics_like", "random_intrinsics",
    "scale_intrinsics", "projection_from_Rt", "depth_from_point",
    "get_perpendicular", "get_closest_point_on_epipolar_line",
    "matrix_cofactor_tensor", "decompose_essential_matrix_no_svd",
]
