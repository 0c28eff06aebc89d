"""Parity + smoke tests for the API-surface additions: MKD, HardNet8,
iterative quad interp, nms3d_minmax, disparity metrics, 3D transform
factories, DepthWarper (reference checked where torch is importable)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
import kornia as K_ref  # noqa: E402

import kornia_tpu as K  # noqa: E402
import kornia_tpu.feature as KF  # noqa: E402


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).random(shape).astype("float32")


class TestMKD:
    @pytest.mark.parametrize("kernel_type", ["concat", "polar", "cart"])
    def test_parity_no_whitening(self, kernel_type):
        p = _rand(5, 1, 32, 32)
        mine = KF.MKDDescriptor(32, kernel_type, whitening=None)(
            jnp.asarray(p))
        ref = K_ref.feature.MKDDescriptor(32, kernel_type, whitening=None)(
            torch.from_numpy(p))
        np.testing.assert_allclose(np.asarray(mine), ref.detach().numpy(),
                                   atol=1e-5)

    def test_whitening_path(self):
        d = KF.MKDDescriptor(32, "polar", whitening=None)
        D = d.odims
        model = {"pca": {"mean": np.zeros(D, "float32"),
                         "eigvecs": np.eye(D, dtype="float32"),
                         "eigvals": np.ones(D, "float32")}}
        dw = KF.MKDDescriptor(32, "polar", whitening="pcawt",
                              whitening_model=model, output_dims=64)
        out = dw(jnp.asarray(_rand(3, 1, 32, 32)))
        assert out.shape == (3, 64)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


class TestHardNet8:
    def test_parity_random_torch_checkpoint(self):
        torch.manual_seed(0)
        ref = K_ref.feature.HardNet8(pretrained=False).eval()
        mine = KF.HardNet8(
            KF.extras.load_hardnet8_torch_weights(ref.state_dict()))
        p = _rand(4, 1, 32, 32, seed=3)
        np.testing.assert_allclose(
            np.asarray(mine(jnp.asarray(p))),
            ref(torch.from_numpy(p)).detach().numpy(), atol=1e-5)


class TestSubpixExtras:
    def _vol(self):
        import scipy.ndimage as ndi
        x = np.random.default_rng(3).standard_normal((2, 2, 4, 10, 12))
        return ndi.gaussian_filter(x, (0, 0, 0.8, 1.2, 1.2)).astype("float32")

    def test_nms3d_minmax_parity(self):
        x = self._vol()
        mx, mn = K.geometry.nms3d_minmax(jnp.asarray(x))
        rmx, rmn = K_ref.geometry.subpix.nms3d_minmax(torch.from_numpy(x))
        assert (np.asarray(mx) == rmx.numpy()).all()
        assert (np.asarray(mn) == rmn.numpy()).all()

    def test_iterative_quad_interp3d_parity(self):
        x = self._vol()
        c, v = K.geometry.iterative_quad_interp3d(jnp.asarray(x))
        rc, rv = K_ref.geometry.subpix.iterative_quad_interp3d(
            torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(c), rc.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), rv.numpy(), atol=1e-4)


class TestWarp3dFactories:
    def test_perspective3d_maps_corners(self):
        src = jnp.asarray(np.array(
            [[[0, 0, 0], [3, 0, 0], [3, 3, 0], [0, 3, 0],
              [0, 0, 3], [3, 0, 3], [3, 3, 3], [0, 3, 3]]], "float32"))
        dst = src * 2.0 + 1.0
        M = K.geometry.get_perspective_transform3d(src, dst)
        sh = jnp.concatenate([src[0], jnp.ones((8, 1))], -1)
        proj = (M[0] @ sh.T).T
        proj = proj[:, :3] / proj[:, 3:]
        np.testing.assert_allclose(np.asarray(proj), np.asarray(dst[0]),
                                   atol=1e-4)

    def test_homography_warp3d_identity_ac_true(self):
        vol = jnp.arange(96.0).reshape(1, 1, 4, 4, 6)
        out = K.geometry.homography_warp3d(
            vol, jnp.eye(4)[None], (4, 4, 6), align_corners=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol),
                                   atol=1e-3)

    def test_shear_affine3d_parity(self):
        c = _rand(2, 3)
        sxy = _rand(2, seed=1)
        mine = K.geometry.get_shear_matrix3d(
            jnp.asarray(c), sxy=jnp.asarray(sxy))
        ref = K_ref.geometry.get_shear_matrix3d(
            torch.from_numpy(c), sxy=torch.from_numpy(sxy))
        np.testing.assert_allclose(np.asarray(mine), ref.numpy(), atol=1e-4)


class TestEpipolarExtras:
    def test_no_svd_decomposition_consistent_with_svd(self):
        rng = np.random.default_rng(0)
        # build a valid essential matrix E = [t]x R
        from kornia_tpu.geometry.conversions import (
            axis_angle_to_rotation_matrix)
        aa = jnp.asarray(rng.standard_normal((4, 3)).astype("float32")) * 0.3
        R = axis_angle_to_rotation_matrix(aa)
        t = jnp.asarray(rng.standard_normal((4, 3)).astype("float32"))
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        Tx = K.geometry.cross_product_matrix(t)
        E = Tx @ R
        R1, R2, t_out = K.geometry.decompose_essential_matrix_no_svd(E)
        # recovered translation is ±t (E defined up to sign/scale)
        dot = np.abs(np.sum(np.asarray(t_out)[..., 0] * np.asarray(t),
                            axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-3)
        # one of R1/R2 matches the true rotation
        err1 = np.abs(np.asarray(R1) - np.asarray(R)).max(axis=(1, 2))
        err2 = np.abs(np.asarray(R2) - np.asarray(R)).max(axis=(1, 2))
        assert (np.minimum(err1, err2) < 1e-3).all()

    def test_closest_point_on_epipolar_line_shapes(self):
        pts1 = jnp.asarray(_rand(1, 6, 2)) * 10
        pts2 = jnp.asarray(_rand(1, 6, 2, seed=1)) * 10
        F = jnp.asarray(_rand(1, 3, 3, seed=2))
        out = K.geometry.get_closest_point_on_epipolar_line(pts1, pts2, F)
        assert out.shape == (1, 6, 2)


class TestDepthWarper:
    def test_identity_pose_roundtrip(self):
        from kornia_tpu.geometry.camera import PinholeCamera
        cam = PinholeCamera.from_parameters(
            fx=32.0, fy=32.0, cx=16.0, cy=16.0, height=32, width=32)
        warper = K.geometry.DepthWarper(cam, 32, 32)
        warper.compute_projection_matrix(cam)
        depth = jnp.ones((1, 1, 32, 32))
        patch = jnp.asarray(_rand(1, 3, 32, 32))
        out = warper(depth, patch)
        # identity pose → identity warp away from borders
        np.testing.assert_allclose(np.asarray(out)[..., 2:-2, 2:-2],
                                   np.asarray(patch)[..., 2:-2, 2:-2],
                                   atol=1e-3)

    def test_depth_warp_functional(self):
        from kornia_tpu.geometry.camera import PinholeCamera
        cam = PinholeCamera.from_parameters(
            fx=32.0, fy=32.0, cx=16.0, cy=16.0, height=32, width=32)
        out = K.geometry.depth_warp(cam, cam, jnp.ones((1, 1, 32, 32)),
                                    jnp.asarray(_rand(1, 3, 32, 32)), 32, 32)
        assert out.shape == (1, 3, 32, 32)


class TestDisparityMetrics:
    def test_values(self):
        a = jnp.asarray(_rand(2, 1, 8, 8))
        b = a + 1.0
        assert np.isclose(
            float(K.metrics.mean_absolute_disparity_error(a, b)), 1.0,
            atol=1e-5)
        assert np.isclose(
            float(K.metrics.root_mean_squared_disparity_error(a, b)), 1.0,
            atol=1e-5)
        assert float(K.metrics.mean_bad_pixel_error(a, b, 3.0)) == 0.0
        assert float(K.metrics.mean_bad_pixel_error(a, b, 0.5)) == 1.0

    def test_masked(self):
        a = jnp.zeros((4, 4))
        b = jnp.ones((4, 4)) * 2.0
        mask = jnp.zeros((4, 4)).at[0].set(1)
        v = float(K.metrics.mean_absolute_disparity_error(a, b, mask))
        assert np.isclose(v, 2.0, atol=1e-5)


class TestSolvers:
    def test_null_vector_3x4(self):
        A = _rand(5, 3, 4, seed=7)
        v = np.asarray(K.geometry.null_vector_3x4(jnp.asarray(A)))
        resid = np.abs(np.einsum("bij,bj->bi", A, v)).max()
        assert resid < 1e-5

    def test_determinant_to_polynomial(self):
        import numpy.polynomial.polynomial as P
        A = _rand(2, 3, 13, seed=9) * 2 - 1
        c = np.asarray(K.geometry.determinant_to_polynomial(jnp.asarray(A)))
        for b in range(2):
            e = [[A[b, i, 0:4][::-1], A[b, i, 4:8][::-1],
                  A[b, i, 8:13][::-1]] for i in range(3)]
            det = P.polysub(
                P.polymul(e[0][0], P.polysub(P.polymul(e[1][1], e[2][2]),
                                             P.polymul(e[1][2], e[2][1]))),
                P.polymul(e[0][1], P.polysub(P.polymul(e[1][0], e[2][2]),
                                             P.polymul(e[1][2], e[2][0]))))
            det = P.polyadd(det, P.polymul(
                e[0][2], P.polysub(P.polymul(e[1][0], e[2][1]),
                                   P.polymul(e[1][1], e[2][0]))))
            det = np.pad(det, (0, 11 - len(det)))
            np.testing.assert_allclose(c[b], det,
                                       atol=2e-3 * abs(det).max())
