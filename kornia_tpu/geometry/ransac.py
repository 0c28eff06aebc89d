"""Batched RANSAC for homography / fundamental / essential estimation
(reference: kornia/geometry/ransac.py:42-408).

TPU-first design: the reference iterates a Python loop with early stop by
confidence (ransac.py:343-408). Here the whole estimator is ONE jitted
program:

  * all `batch_size` minimal samples of all `max_iterations` rounds are
    drawn up front with `jax.random` (shape-static),
  * model estimation is the vmapped minimal solver (embarrassingly
    parallel — this is where TPUs shine),
  * scoring is one big (models x points) error matrix → MSAC soft score,
  * early stop becomes a *mask*: rounds whose cumulative sample count
    exceeds the confidence bound contribute nothing (matching the
    reference's stopping semantics without dynamic control flow),
  * the best model is polished by iteratively-reweighted least squares on
    its inlier set (reference's local-optimization step :383-393).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.linalg import f32_matmul_precision
from ..core.dtype import as_float
from .epipolar import (
    find_fundamental,
    run_5point,
    run_8point,
    sampson_epipolar_distance,
    symmetrical_epipolar_distance,
)
from .homography import (
    find_homography_dlt,
    find_homography_dlt_iterated,
    sample_is_valid_for_homography,
    symmetric_transfer_error,
)

__all__ = ["RansacResult", "ransac", "RANSAC"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RansacResult:
    model: jax.Array  # (3, 3) best model
    inliers: jax.Array  # (N,) bool
    score: jax.Array  # scalar MSAC score
    inlier_count: jax.Array  # scalar

    def tree_flatten(self):
        return (self.model, self.inliers, self.score, self.inlier_count), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


_CONFIGS = {
    "homography": dict(minimal=4, models_per_sample=1),
    "fundamental": dict(minimal=8, models_per_sample=1),
    "fundamental_7pt": dict(minimal=7, models_per_sample=3),
    "essential": dict(minimal=5, models_per_sample=20),
}


def _estimate(model_type: str, p1: jax.Array, p2: jax.Array) -> jax.Array:
    """(S, m, 2) x2 → (S, K, 3, 3) candidate models per sample."""
    if model_type == "homography":
        return find_homography_dlt(p1, p2)[:, None]
    if model_type == "fundamental":
        return run_8point(p1, p2)[:, None]
    if model_type == "fundamental_7pt":
        from .epipolar import run_7point
        return run_7point(p1, p2)
    if model_type == "essential":
        return run_5point(p1, p2)
    raise ValueError(f"unknown model type {model_type}")


def _error(model_type: str, p1: jax.Array, p2: jax.Array, M: jax.Array
           ) -> jax.Array:
    """Squared residual of every point under every model:
    M (K, 3, 3), points (N, 2) → (K, N)."""
    if model_type == "homography":
        return symmetric_transfer_error(p1[None], p2[None], M, squared=True)
    return symmetrical_epipolar_distance(p1[None], p2[None], M, squared=True)


def _sample_validity(model_type: str, p1: jax.Array, p2: jax.Array) -> jax.Array:
    if model_type == "homography":
        return sample_is_valid_for_homography(p1, p2)
    return jnp.ones(p1.shape[0], dtype=bool)


# Above this many model x point error entries, score in chunks: the direct
# path materializes (M, N, 3) epipolar intermediates — at the reference's
# essential-RANSAC scale (10 rounds x 2048 samples x 10 models x 2048
# points) that is ~22 GB of HLO temps, beyond a v5e's 16 GB HBM.
_STREAM_THRESHOLD = 1 << 24


def _msac_scores(model_type: str, p1: jax.Array, p2: jax.Array,
                 models: jax.Array, mask: jax.Array, th2: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """Streaming MSAC scorer: (M, 3, 3) models -> (msac (M,), inliers (M,)).

    Chunks the model axis with `lax.map` so each step's error tile stays
    VMEM/HBM-friendly; the full (M, N) error matrix and its (M, N, 3)
    epipolar intermediates never materialize at once.
    """
    M = models.shape[0]
    N = p1.shape[0]

    def score(ms):
        errs = _error(model_type, p1, p2, ms)
        errs = jnp.where(mask[None, :], errs, th2)
        msac = jnp.sum(jnp.clip(errs, 0.0, th2), axis=-1)
        cnt = jnp.sum((errs < th2) & mask[None, :], axis=-1)
        return msac, cnt

    if M * N <= _STREAM_THRESHOLD:
        return score(models)

    chunk = max(256, min(M, _STREAM_THRESHOLD // max(N, 1)))
    pad = (-M) % chunk
    mpad = jnp.concatenate(
        [models, jnp.broadcast_to(jnp.eye(3, dtype=models.dtype),
                                  (pad, 3, 3))]) if pad else models
    msac, cnt = jax.lax.map(score, mpad.reshape(-1, chunk, 3, 3))
    return msac.reshape(-1)[:M], cnt.reshape(-1)[:M]


def max_samples_by_conf(n_inl: jax.Array, num_tc: int, sample_size: int,
                        conf: float) -> jax.Array:
    """Confidence-based sample bound (reference: ransac.py:170)."""
    eps = 1e-9
    ratio = jnp.clip(n_inl.astype(jnp.float32) / num_tc, eps, 1.0 - eps)
    return jnp.log(1.0 - conf) / jnp.minimum(
        jnp.log1p(-(ratio**sample_size)), -eps)


@partial(jax.jit, static_argnames=("model_type", "batch_size",
                                   "max_iterations", "polish_iters"))
@f32_matmul_precision
def ransac(
    points1: jax.Array,
    points2: jax.Array,
    key: jax.Array,
    model_type: str = "homography",
    inl_th: float = 2.0,
    batch_size: int = 2048,
    max_iterations: int = 10,
    confidence: float = 0.99,
    polish_iters: int = 3,
    mask: Optional[jax.Array] = None,
    scores: Optional[jax.Array] = None,
) -> RansacResult:
    """Single-pair robust estimation; vmap over pairs for batching.

    points: (N, 2). `mask` (N,) marks valid correspondences (padded
    entries False) — supports the framework's padded-K pipelines.
    `scores` (N,) enables PROSAC-style progressive sampling (reference:
    ransac.py PROSAC option): early rounds draw from the highest-quality
    correspondences, later rounds flatten toward uniform.
    """
    points1 = as_float(points1)
    points2 = as_float(points2)
    N = points1.shape[0]
    cfg = _CONFIGS[model_type]
    m = cfg["minimal"]
    if mask is None:
        mask = jnp.ones(N, dtype=bool)
    valid_count = jnp.sum(mask)

    # --- round loop with REAL early exit ------------------------------------
    # One `lax.while_loop` round = S minimal samples, estimation, MSAC
    # scoring. The loop stops as soon as the confidence bound of the best
    # inlier count is met (the reference's early exit, ransac.py:343) —
    # unlike a fully unrolled T×S program, rounds that the bound prunes
    # cost NOTHING. At the typical 50-70% inlier ratios of a matched pair
    # this executes exactly one round; degenerate scenes still get all T.
    T, S = max_iterations, batch_size
    th2 = inl_th * inl_th
    base_logits = jnp.where(mask, 0.0, -jnp.inf)
    z = None
    if scores is not None:
        # PROSAC schedule: per-round weight beta_r decays linearly so
        # round 0 is sharply score-biased and the last round is uniform
        z = (scores - jnp.mean(scores)) / (jnp.std(scores) + 1e-6)

    def one_round(r, rkey):
        logits = base_logits
        if z is not None:
            beta = 3.0 * jnp.maximum(1.0 - r / max(T - 1, 1), 0.0)
            logits = logits + beta * z
        # Gumbel top-k trick over masked logits → m distinct valid indices
        g = jax.random.gumbel(rkey, (S, N)) + logits[None]
        _, idx = jax.lax.top_k(g, m)  # (S, m)
        p1s = points1[idx]
        p2s = points2[idx]
        sample_ok = _sample_validity(model_type, p1s, p2s)
        models = _estimate(model_type, p1s, p2s)  # (S, K, 3, 3)
        K = models.shape[1]
        models = models.reshape(S * K, 3, 3)
        model_ok = jnp.repeat(sample_ok, K) & (
            jnp.linalg.norm(models.reshape(-1, 9), axis=-1) > 1e-6)
        if K > 1 and N > 192:
            # two-stage scoring: every candidate of a minimal sample fits
            # its 5 points exactly, but only ~1 of the K is the true
            # model — the rest are wildly wrong. A ~128-point strided
            # prescore picks the per-sample winner at 1/K of the full
            # scoring cost; only S winners see all N points (the MSAC
            # scoring stage was ~K/(1+K·128/N)x the whole-round budget).
            step = max(N // 128, 1)
            msac_s, _ = _msac_scores(model_type, points1[::step],
                                     points2[::step], models, mask[::step],
                                     th2)
            msac_s = jnp.where(model_ok, msac_s, jnp.inf)
            bk = jnp.argmin(msac_s.reshape(S, K), axis=1)  # (S,)
            models = models.reshape(S, K, 3, 3)[jnp.arange(S), bk]
            model_ok = model_ok.reshape(S, K)[jnp.arange(S), bk]
        msac, cnt = _msac_scores(model_type, points1, points2, models,
                                 mask, th2)
        msac = jnp.where(model_ok, msac, jnp.inf)
        b = jnp.argmin(msac)
        return models[b], msac[b], cnt[b]

    def cond(state):
        r, _, _, _, best_cnt = state
        # the confidence ratio is inliers / VALID correspondences — using
        # the padded N would undercount the ratio ~4x in fixed-K pipelines
        # and silently run every round
        bound = max_samples_by_conf(best_cnt, jnp.maximum(valid_count, 1),
                                    m, confidence)
        return (r < T) & ((r * S).astype(jnp.float32) <= bound)

    def body(state):
        r, k, best_model, best_msac, best_cnt = state
        k, sub = jax.random.split(k)
        mdl, ms, ct = one_round(r, sub)
        better = ms < best_msac
        best_model = jnp.where(better, mdl, best_model)
        best_cnt = jnp.where(better, ct, best_cnt)
        best_msac = jnp.minimum(ms, best_msac)
        return r + 1, k, best_model, best_msac, best_cnt

    _, _, best_model, best_score, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0), key, jnp.eye(3, dtype=points1.dtype),
         jnp.asarray(jnp.inf, points1.dtype),
         jnp.asarray(0, jnp.int32)))

    # --- polish: iterated local optimization (reference: ransac.py:383-393)
    # Each round refits on the current inlier set, re-scores, and accepts
    # only improvements — the inlier set expands as the model improves
    # (expand-and-refit LO). For essential models the refit is a weighted
    # 8-point projected to the manifold plus a weighted Gauss-Newton on
    # the (R, t) manifold (epipolar.polish_essential).
    def lo_round(carry, _):
        model, score = carry
        err = _error(model_type, points1, points2, model[None])[0]
        w = jnp.where((err < th2) & mask, 1.0, 0.0)
        if model_type == "homography":
            refit = find_homography_dlt_iterated(
                points1[None], points2[None], w[None], n_iter=2)[0]
        elif model_type in ("fundamental", "fundamental_7pt"):
            refit = run_8point(points1[None], points2[None], w[None])[0]
        else:  # essential
            from .epipolar import polish_essential
            F = run_8point(points1[None], points2[None], w[None])[0]
            U, _sv, Vt = jnp.linalg.svd(F)
            S_ = jnp.array([1.0, 1.0, 0.0], F.dtype)
            E8 = (U * S_[None, :]) @ Vt
            # pick the better of {8-point refit, current} as the GN seed
            cand = jnp.stack([E8, model])[None]  # (1, 2, 3, 3)
            cand = polish_essential(cand, points1[None], points2[None],
                                    iters=2, weights=w[None])[0]
            e_c = _error(model_type, points1, points2, cand)
            msac_c = jnp.sum(jnp.where(mask[None], jnp.clip(e_c, 0, th2),
                                       th2), -1)
            refit = cand[jnp.argmin(msac_c)]
        err_r = _error(model_type, points1, points2, refit[None])[0]
        msac_r = jnp.sum(jnp.where(mask, jnp.clip(err_r, 0, th2), th2))
        better = msac_r < score
        model = jnp.where(better, refit, model)
        score = jnp.minimum(msac_r, score)
        return (model, score), None

    (final, final_score), _ = jax.lax.scan(
        lo_round, (best_model, best_score), None, length=polish_iters)
    final_err = _error(model_type, points1, points2, final[None])[0]
    inliers = (final_err < th2) & mask
    return RansacResult(
        model=final,
        inliers=inliers,
        score=final_score,
        inlier_count=jnp.sum(inliers),
    )


class RANSAC:
    """Module-style wrapper mirroring the reference API
    (geometry/ransac.py:42)."""

    def __init__(self, model_type: str = "homography", inl_th: float = 2.0,
                 batch_size: int = 2048, max_iter: int = 10,
                 confidence: float = 0.99, max_lo_iters: int = 5):
        self.model_type = model_type
        self.inl_th = inl_th
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.confidence = confidence
        self.max_lo_iters = max_lo_iters

    def __call__(self, kp1: jax.Array, kp2: jax.Array,
                 key: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        if key is None:
            key = jax.random.PRNGKey(0)
        res = ransac(kp1, kp2, key, self.model_type, self.inl_th,
                     self.batch_size, self.max_iter, self.confidence,
                     self.max_lo_iters, mask)
        return res.model, res.inliers
