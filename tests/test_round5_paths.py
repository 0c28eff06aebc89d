"""Fast regression legs for the round-5 changes: residual-gated
Durand-Kerner, two-stage MSAC preselection, 256x32 RANSAC rounds, the
bf16 patch-sampling mode, and VO.refine_from_cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.geometry.solvers import poly_roots
from kornia_tpu.geometry.ransac import ransac


def test_poly_roots_gated_matches_fixed():
    rng = np.random.default_rng(3)
    # random degree-10 polynomials with well-spread roots
    roots = rng.normal(0, 1.2, (16, 10)) + 1j * rng.normal(0, 1.2, (16, 10))
    coeffs = np.stack([np.real(np.poly(r)) for r in roots]).astype(np.float32)
    # imaginary parts of poly() of non-conjugate roots are nonzero; use
    # the full complex coefficients' real part as a generic test poly
    c = jnp.asarray(coeffs)
    fixed = np.asarray(poly_roots(c, iters=100))
    gated = np.asarray(poly_roots(c, iters=100, tol=1e-6))

    def root_set_dist(a, b):
        # Hausdorff-ish: every fixed root has a close gated root
        d = np.abs(a[:, None] - b[None, :])
        return max(d.min(1).max(), d.min(0).max())

    for f, g in zip(fixed, gated):
        assert root_set_dist(f, g) < 1e-3


def test_poly_roots_gated_converges_fast():
    # the gate must stop well before the 100-iteration ceiling on a
    # benign batch: equal outputs at iters=100 and iters=60 prove the
    # while_loop exited early (both hit the tol stop)
    c = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (8, 11)).astype(np.float32))
    a = np.asarray(poly_roots(c, iters=100, tol=1e-5))
    b = np.asarray(poly_roots(c, iters=60, tol=1e-5))
    np.testing.assert_allclose(a, b, atol=1e-6)


def _epipolar_pair(n=512, inlier_frac=0.6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (n, 3)) + np.array([0, 0, 4.0])
    R = np.array([[np.cos(0.1), 0, np.sin(0.1)], [0, 1, 0],
                  [-np.sin(0.1), 0, np.cos(0.1)]])
    t = np.array([0.5, 0.05, 0.02])
    x1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:]
    n_out = int(n * (1 - inlier_frac))
    x2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    return (jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            R, t, n_out)


def test_ransac_essential_256x32_two_stage():
    """256-sample rounds + subset preselection must still find the true
    essential model at 60% inliers."""
    x1, x2, R, t, n_out = _epipolar_pair()
    res = ransac(x1, x2, jax.random.PRNGKey(0), "essential", inl_th=2e-3,
                 batch_size=256, max_iterations=32,
                 mask=jnp.ones(x1.shape[0], bool))
    inl = np.asarray(res.inliers)
    # outliers rejected, inliers kept
    assert inl[:n_out].mean() < 0.15, inl[:n_out].mean()
    assert inl[n_out:].mean() > 0.85, inl[n_out:].mean()
    # recovered motion direction matches (E defined up to scale/sign)
    from kornia_tpu.geometry.epipolar import (
        motion_from_essential_choose_solution)
    Rr, tr, _ = motion_from_essential_choose_solution(
        res.model[None], jnp.eye(3)[None], jnp.eye(3)[None],
        x1[None], x2[None], mask=res.inliers[None])
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(np.asarray(Rr[0]) @ R.T) - 1) / 2, -1, 1)))
    tdir = np.asarray(tr[0, :, 0])
    cos_t = abs(float(tdir @ t) / (np.linalg.norm(tdir) * np.linalg.norm(t)))
    assert ang < 1.0, ang
    assert cos_t > 0.99, cos_t


def test_patch_mode_bf16_close_to_exact():
    from kornia_tpu.feature.laf import extract_patches_from_pyramid
    from kornia_tpu.feature import laf as laf_mod
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 128, 256))
    lafs = jnp.asarray(
        np.stack([np.array([[8.0, 0, 60.0], [0, 8.0, 40.0]]),
                  np.array([[6.0, 2.0, 180.0], [-2.0, 6.0, 90.0]])])[None],
        jnp.float32)
    orig = laf_mod._FORCE_PALLAS
    laf_mod._FORCE_PALLAS = True
    try:
        exact = extract_patches_from_pyramid(img, lafs, 33,
                                             pallas_mode="split")
        fast = extract_patches_from_pyramid(img, lafs, 33,
                                            pallas_mode="bf16")
    finally:
        laf_mod._FORCE_PALLAS = orig
    # interpret mode carries no bf16 rounding — this asserts the code
    # path wiring; hardware error (~4e-3) is validated by the TPU A/B in
    # ROOFLINE.md round-5 notes
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=1e-5)


def test_vo_refine_from_cache_roundtrip():
    from kornia_tpu.slam.vo import VisualOdometry
    from kornia_tpu.utils.render import (make_room_scene, render_sequence,
                                         walk_trajectory)
    H, W = 120, 160
    K = jnp.array([[0.8 * W, 0.0, W / 2], [0.0, 0.8 * W, H / 2],
                   [0.0, 0.0, 1.0]], jnp.float32)
    scene = make_room_scene(tex_size=160)
    traj = walk_trajectory(6, depth=10.0)
    frames, _ = render_sequence(scene, K, traj, H, W)
    vo = VisualOdometry(K, num_features=192, ransac_iters=8,
                        ransac_batch=256)
    res = vo.run(frames, refine=True)
    out = vo.refine_from_cache([p.copy() for p in res.poses])
    assert len(out) == len(res.poses)
    for p in out:
        assert np.isfinite(p).all()
    # re-refining an already-refined chain must not blow up the
    # trajectory: compare both against GT (the two-pass GNC restart can
    # legitimately move individual poses at this tiny noisy scale)
    from kornia_tpu.metrics.metrics import ate_rmse

    def _ate(ps):
        c = np.stack([-p[:3, :3].T @ p[:3, 3] for p in ps])
        g = np.stack([-t[:3, :3].T @ t[:3, 3] for t in traj])
        return float(ate_rmse(jnp.asarray(c), jnp.asarray(g),
                              with_scale=True))

    assert _ate(out) < 2.0 * _ate(res.poses) + 0.05, (_ate(out),
                                                      _ate(res.poses))


def test_vo_refine_from_cache_requires_run():
    from kornia_tpu.slam.vo import VisualOdometry
    K = jnp.eye(3)
    vo = VisualOdometry(K, num_features=64)
    with pytest.raises(RuntimeError):
        vo.refine_from_cache([np.eye(4)])
