"""Numerically-robust linear algebra primitives for TPU (f64-free).

TPU-native replacements for the reference's f64-promotion helpers
(kornia/core/utils.py: _torch_svd_cast:232, _torch_solve_cast:273,
safe_solve_with_mask:295, safe_inverse_with_mask:320,
_inverse_3x3_closed_form:137). Instead of promoting to f64 (unavailable on
the TPU MXU), we use algorithmic conditioning:

  * row/column equilibration before solves,
  * one step of iterative refinement after an f32 solve,
  * closed-form cofactor inverses for 2x2/3x3,
  * masked "safe" variants that return a validity mask instead of raising.

All functions are batched over leading dims and jit/vmap/grad-closed.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "det_2x2",
    "det_3x3",
    "inverse_2x2",
    "inverse_3x3",
    "safe_solve_with_mask",
    "safe_inverse_with_mask",
    "solve_refined",
    "lstsq_nullspace",
    "eigh_smallest",
    "symeig_3x3",
    "gauss_det",
    "gauss_solve",
    "nullspace_inverse_iteration",
]

_EPS = 1e-12


def det_2x2(m: jax.Array) -> jax.Array:
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def det_3x3(m: jax.Array) -> jax.Array:
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inverse_2x2(m: jax.Array, eps: float = _EPS) -> jax.Array:
    det = det_2x2(m)[..., None, None]
    adj = jnp.stack(
        [
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return adj / (det + jnp.where(det >= 0, eps, -eps))


def inverse_3x3(m: jax.Array, eps: float = _EPS) -> jax.Array:
    """Closed-form cofactor inverse (reference: core/utils.py:137)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    det = det[..., None, None]
    adj_t = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj_t / (det + jnp.where(det >= 0, eps, -eps))


def _equilibrate(A: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-scale A (and b) by max-abs so the f32 LU is better conditioned."""
    scale = jnp.max(jnp.abs(A), axis=-1, keepdims=True)
    scale = jnp.where(scale > 0, scale, 1.0)
    return A / scale, b / scale, scale


def solve_refined(A: jax.Array, b: jax.Array, iters: int = 1) -> jax.Array:
    """f32 solve with row equilibration + `iters` steps of iterative refinement.

    TPU replacement for the reference's f64-promoted solve
    (core/utils.py:_torch_solve_cast:273).
    """
    As, bs, _ = _equilibrate(A, b)
    x = jnp.linalg.solve(As, bs)
    for _ in range(iters):
        r = bs - As @ x
        x = x + jnp.linalg.solve(As, r)
    return x


def safe_solve_with_mask(B: jax.Array, A: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve A X = B returning (X, A_LU_placeholder, valid_mask).

    Mirrors the reference API (core/utils.py:295): instead of raising on a
    singular batch element, return a boolean mask of which solves are valid.
    """
    As, Bs, _ = _equilibrate(A, B)
    det = jnp.linalg.det(As)
    ok = jnp.abs(det) > _EPS
    # Guard singular systems with identity so the solve never produces inf/nan
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    A_safe = jnp.where(ok[..., None, None], As, eye)
    X = jnp.linalg.solve(A_safe, Bs)
    r = Bs - A_safe @ X
    X = X + jnp.linalg.solve(A_safe, r)
    X = jnp.where(ok[..., None, None], X, jnp.zeros_like(X))
    ok = ok & jnp.all(jnp.isfinite(X), axis=(-2, -1))
    return X, A_safe, ok


def safe_inverse_with_mask(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched inverse with validity mask (reference: core/utils.py:320)."""
    n = A.shape[-1]
    if n == 2:
        inv = inverse_2x2(A)
        ok = jnp.abs(det_2x2(A)) > _EPS
    elif n == 3:
        inv = inverse_3x3(A)
        ok = jnp.abs(det_3x3(A)) > _EPS
    else:
        det = jnp.linalg.det(A)
        ok = jnp.abs(det) > _EPS
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        inv = jnp.linalg.inv(jnp.where(ok[..., None, None], A, eye))
    inv = jnp.where(ok[..., None, None], inv, jnp.zeros_like(inv))
    return inv, ok


def lstsq_nullspace(A: jax.Array) -> jax.Array:
    """Unit null vector of A (..., M, N): right-singular vector of the
    smallest singular value, computed via eigh of AᵀA for TPU friendliness
    (symmetric eig is faster and more stable on TPU than full SVD).

    The Gram matrix squares the condition number, so callers MUST normalize
    (e.g. Hartley normalization) first — our DLT/8-point solvers do.
    """
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def eigh_smallest(S: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(eigenvalue, eigenvector) of the smallest eigenvalue of symmetric S."""
    vals, vecs = jnp.linalg.eigh(S)
    return vals[..., 0], vecs[..., :, 0]


def symeig_3x3(S: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Eigendecomposition of a batched symmetric 3x3 (ascending)."""
    return jnp.linalg.eigh(S)


def gauss_det(A: jax.Array) -> jax.Array:
    """Determinant of a small batched matrix via UNROLLED Gaussian
    elimination with partial pivoting.

    TPU-first replacement for `jnp.linalg.det` on tiny matrices: XLA's LU
    lowering runs sequential loops with dynamic slices, which is ~10-50x
    slower than this fully-vectorized static unroll for n <= ~16 (the
    5-point solver's 22 batched 10x10 determinants dropped from ~1.2 s to
    ~ms-scale at 20k samples on a v5e).
    """
    n = A.shape[-1]
    a = A
    det = jnp.ones(A.shape[:-2], A.dtype)
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(a[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        det = det * jnp.where(p == k, 1.0, -1.0)
        onehot_p = jax.nn.one_hot(p, n, dtype=a.dtype)
        rp = jnp.einsum("...r,...rc->...c", onehot_p, a)
        rk = a[..., k, :]
        ek = jax.nn.one_hot(jnp.asarray(k), n, dtype=a.dtype)
        diff = rp - rk
        a = a + ek[..., :, None] * diff[..., None, :] \
            - onehot_p[..., :, None] * diff[..., None, :]
        piv = a[..., k, k]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        m = a[..., :, k] / safe[..., None]
        m = jnp.where(rows > k, m, 0.0)
        a = a - m[..., :, None] * a[..., k:k + 1, :]
    return det


def gauss_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for small batched A via unrolled partial-pivot
    Gaussian elimination (same rationale as `gauss_det`). b: (..., n)."""
    n = A.shape[-1]
    aug = jnp.concatenate([A, b[..., :, None]], -1)  # (..., n, n+1)
    rows = jnp.arange(n)
    for k in range(n):
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        onehot_p = jax.nn.one_hot(p, n, dtype=aug.dtype)
        rp = jnp.einsum("...r,...rc->...c", onehot_p, aug)
        rk = aug[..., k, :]
        ek = jax.nn.one_hot(jnp.asarray(k), n, dtype=aug.dtype)
        diff = rp - rk
        aug = aug + ek[..., :, None] * diff[..., None, :] \
            - onehot_p[..., :, None] * diff[..., None, :]
        piv = aug[..., k, k]
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        m = aug[..., :, k] / safe[..., None]
        m = jnp.where(rows > k, m, 0.0)
        aug = aug - m[..., :, None] * aug[..., k:k + 1, :]
    # back substitution (unrolled)
    x = jnp.zeros(A.shape[:-2] + (n,), A.dtype)
    for k in range(n - 1, -1, -1):
        rhs = aug[..., k, n] - jnp.sum(aug[..., k, :n] * x, -1)
        piv = aug[..., k, k]
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        x = x.at[..., k].set(rhs / safe) if x.ndim == 1 else \
            x + jax.nn.one_hot(jnp.asarray(k), n, dtype=x.dtype) \
            * (rhs / safe - x[..., k])[..., None]
    return x


def nullspace_qr(A: jax.Array) -> jax.Array:
    """Orthonormal basis of the nullspace of a batched wide matrix
    A (..., R, C), R < C → (..., C, C - R), via UNROLLED Householder QR
    of Aᵀ.

    TPU-first replacement for `eigh(AᵀA)`-based nullspaces: forming the
    Gram matrix squares the condition number, which in f32 destroys the
    small-subspace separation on near-degenerate samples (the 5-point
    solver's worst minimal samples had the true essential matrix 40% OUT
    of the eigh nullspace span; QR brings the span residual from 4e-1 to
    4e-5). Unrolled static-shape reflections — no XLA QR loops — so it
    stays fast at RANSAC batch sizes. Reference analogue: the f64
    `_torch_svd_cast` promotion in kornia core/utils.py:232.
    """
    R, C = A.shape[-2], A.shape[-1]
    if R >= C:
        raise ValueError("nullspace_qr expects a wide matrix (R < C)")
    M = jnp.swapaxes(A, -1, -2)  # (..., C, R)
    rows = jnp.arange(C)
    vs = []
    for k in range(R):
        x = jnp.where(rows >= k, M[..., :, k], 0.0)  # (..., C)
        xk = M[..., k, k]
        nrm = jnp.linalg.norm(x, axis=-1)
        alpha = -jnp.sign(jnp.where(xk == 0, 1.0, xk)) * nrm
        v = x - alpha[..., None] * jax.nn.one_hot(
            jnp.asarray(k), C, dtype=M.dtype)
        vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
        v = jnp.where(vn > 1e-30, v / jnp.maximum(vn, 1e-30), 0.0)
        vs.append(v)
        M = M - 2.0 * v[..., :, None] * jnp.einsum(
            "...c,...cr->...r", v, M)[..., None, :]
    # null basis = (H_0 ... H_{R-1}) applied to the trailing identity block
    V = jnp.zeros(A.shape[:-2] + (C, C - R), A.dtype) + jnp.eye(
        C, dtype=A.dtype)[:, R:]
    for v in reversed(vs):
        V = V - 2.0 * v[..., :, None] * jnp.einsum(
            "...c,...cn->...n", v, V)[..., None, :]
    return V


def nullspace_inverse_iteration(A: jax.Array, iters: int = 2) -> jax.Array:
    """Unit null vector of a small batched A (..., m, n) via inverse
    iteration on the (regularized) Gram matrix.

    TPU-first replacement for the eigh-based `lstsq_nullspace` on HOT
    paths: XLA's batched eigh runs Jacobi sweeps in sequential loops
    (~5.8 s for 409k 10x10 matrices on a v5e); two unrolled Gaussian
    solves converge to the smallest eigenvector whenever the matrix is
    (near-)rank-deficient — exactly the regime where a null vector is
    meaningful. Callers needing exact eigenvectors of well-conditioned
    matrices should keep `lstsq_nullspace`.
    """
    G = jnp.einsum("...mi,...mj->...ij", A, A)
    n = G.shape[-1]
    tr = jnp.trace(G, axis1=-2, axis2=-1)[..., None, None]
    Greg = G + (1e-7 / n) * tr * jnp.eye(n, dtype=G.dtype)
    v = jnp.ones(G.shape[:-2] + (n,), G.dtype) / math.sqrt(n)
    for _ in range(iters):
        v = gauss_solve(Greg, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-30)
    return v


def f32_matmul_precision(fn):
    """Decorator: trace `fn` under jax.default_matmul_precision("highest").

    TPU's DEFAULT matmul precision is single-pass bf16 — measured to
    quadruple VO trajectory error (walk100 refined 3.9% -> 17.1% ATE)
    through the BA normal equations / triangulations / solvers. Every
    geometric-estimation entry point is wrapped so its einsums and dots
    are true f32 regardless of the ambient default; image/CNN paths keep
    the fast default.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
