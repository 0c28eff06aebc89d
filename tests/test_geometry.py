import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.geometry.conversions as C
import kornia_tpu.geometry.epipolar as Ep
import kornia_tpu.geometry.homography as Hm
import kornia_tpu.geometry.linalg as L
from kornia_tpu.geometry.liegroup import Quaternion, Se2, Se3, So2, So3
from kornia_tpu.geometry.solvers import poly_roots, solve_cubic, solve_quadratic


def make_scene(key, B=4, N=16, noise=0.0):
    ks = jax.random.split(key, 5)
    aa = jax.random.normal(ks[0], (B, 3)) * 0.2
    R = C.axis_angle_to_rotation_matrix(aa)
    t = jax.random.normal(ks[1], (B, 3, 1)) * 0.5 + jnp.array([1.0, 0, 0]).reshape(3, 1)
    X = jax.random.normal(ks[2], (B, N, 3)) + jnp.array([0.0, 0, 5.0])
    K = jnp.broadcast_to(jnp.array([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]]), (B, 3, 3))
    P1 = Ep.projection_from_KRt(K, jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
                                jnp.zeros((B, 3, 1)))
    P2 = Ep.projection_from_KRt(K, R, t)
    Xh = jnp.concatenate([X, jnp.ones((B, N, 1))], -1)
    x1h = jnp.einsum("bij,bnj->bni", P1, Xh)
    x2h = jnp.einsum("bij,bnj->bni", P2, Xh)
    x1 = x1h[..., :2] / x1h[..., 2:]
    x2 = x2h[..., :2] / x2h[..., 2:]
    if noise > 0:
        x1 = x1 + noise * jax.random.normal(ks[3], x1.shape)
        x2 = x2 + noise * jax.random.normal(ks[4], x2.shape)
    return dict(R=R, t=t, K=K, X=X, x1=x1, x2=x2, P1=P1, P2=P2)


class TestConversions:
    def test_rad_deg(self):
        np.testing.assert_allclose(C.rad2deg(jnp.pi), 180.0, rtol=1e-6)
        np.testing.assert_allclose(C.deg2rad(jnp.array(90.0)), jnp.pi / 2, rtol=1e-6)

    def test_homogeneous_roundtrip(self, key):
        pts = jax.random.normal(key, (2, 5, 3))
        h = C.convert_points_to_homogeneous(pts)
        assert h.shape == (2, 5, 4)
        np.testing.assert_allclose(C.convert_points_from_homogeneous(h), pts,
                                   atol=1e-5)

    def test_rotation_roundtrips(self, key):
        aa = jax.random.normal(key, (8, 3)) * 0.8
        R = C.axis_angle_to_rotation_matrix(aa)
        # orthonormality
        RtR = R @ jnp.swapaxes(R, -1, -2)
        np.testing.assert_allclose(RtR, jnp.broadcast_to(jnp.eye(3), RtR.shape),
                                   atol=1e-5)
        # quaternion path
        q = C.rotation_matrix_to_quaternion(R)
        np.testing.assert_allclose(C.quaternion_to_rotation_matrix(q), R, atol=1e-5)
        # axis-angle path (compare as rotations)
        aa2 = C.rotation_matrix_to_angle_axis(R)
        np.testing.assert_allclose(C.axis_angle_to_rotation_matrix(aa2), R,
                                   atol=1e-5)

    def test_small_angle(self):
        aa = jnp.array([[1e-10, 0, 0]])
        R = C.axis_angle_to_rotation_matrix(aa)
        np.testing.assert_allclose(R[0], jnp.eye(3), atol=1e-6)
        q = C.angle_axis_to_quaternion(aa)
        np.testing.assert_allclose(q[0], [1, 0, 0, 0], atol=1e-6)

    def test_euler_roundtrip(self, key):
        rpy = jax.random.uniform(key, (3, 8)) * 1.0 - 0.5
        w, x, y, z = C.quaternion_from_euler(rpy[0], rpy[1], rpy[2])
        r2, p2, y2 = C.euler_from_quaternion(w, x, y, z)
        np.testing.assert_allclose(rpy[0], r2, atol=1e-5)
        np.testing.assert_allclose(rpy[1], p2, atol=1e-5)
        np.testing.assert_allclose(rpy[2], y2, atol=1e-5)

    def test_skew(self, key):
        v = jax.random.normal(key, (4, 3))
        S = C.vector_to_skew_symmetric_matrix(v)
        np.testing.assert_allclose(S + jnp.swapaxes(S, -1, -2), 0.0, atol=1e-6)
        w = jax.random.normal(key, (4, 3))
        np.testing.assert_allclose(
            jnp.einsum("bij,bj->bi", S, w), jnp.cross(v, w), atol=1e-5)

    def test_quat_log_exp(self, key):
        q_log = jax.random.normal(key, (5, 3)) * 0.3
        q = C.quaternion_log_to_exp(q_log)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(C.quaternion_exp_to_log(q), q_log, atol=1e-5)


class TestLieGroups:
    def test_so3_exp_log(self, key):
        v = jax.random.normal(key, (6, 3)) * 0.7
        g = So3.exp(v)
        np.testing.assert_allclose(g.log(), v, atol=1e-5)

    def test_so3_compose_inverse(self, key):
        k1, k2 = jax.random.split(key)
        a = So3.random(k1, (4,))
        b = So3.random(k2, (4,))
        ab = a * b
        np.testing.assert_allclose((ab * ab.inverse()).matrix(),
                                   jnp.broadcast_to(jnp.eye(3), (4, 3, 3)),
                                   atol=1e-5)

    def test_se3_exp_log(self, key):
        v = jax.random.normal(key, (6, 6)) * 0.5
        np.testing.assert_allclose(Se3.exp(v).log(), v, atol=1e-4)

    def test_se3_act(self, key):
        T = Se3.random(key, (4,))
        pts = jax.random.normal(key, (4, 10, 3))
        out = T.act(pts)
        back = T.inverse().act(out)
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_se3_matrix(self, key):
        T = Se3.random(key, (4,))
        M = T.matrix()
        assert M.shape == (4, 4, 4)
        np.testing.assert_allclose(M[:, 3], jnp.broadcast_to(
            jnp.array([0.0, 0, 0, 1]), (4, 4)), atol=1e-6)

    def test_se3_through_jit_grad(self, key):
        def loss(v):
            T = Se3.exp(v)
            pts = jnp.ones((1, 3))
            return jnp.sum(T.act(pts) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03]))
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_so2_se2(self, key):
        theta = jax.random.normal(key, (5,)) * 0.5
        r = So2.exp(theta)
        np.testing.assert_allclose(r.log(), theta, atol=1e-5)
        v = jax.random.normal(key, (5, 3)) * 0.5
        np.testing.assert_allclose(Se2.exp(v).log(), v, atol=1e-4)

    def test_quaternion_slerp(self):
        q0 = Quaternion.identity((1,))
        q1 = Quaternion.from_axis_angle(jnp.array([[1.0, 0, 0]]))
        qh = q0.slerp(q1, 0.5)
        aa = qh.to_axis_angle()
        np.testing.assert_allclose(aa, [[0.5, 0, 0]], atol=1e-5)

    def test_quaternion_average(self, key):
        q = Quaternion.random(key, (1,)).data[0]
        stack = jnp.stack([q, q, q])
        avg = Quaternion.average(stack)
        dot = jnp.abs(jnp.sum(avg.data * q))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


class TestSolvers:
    def test_quadratic(self):
        # x² - 3x + 2 → roots 1, 2
        r = solve_quadratic(jnp.array([[1.0, -3.0, 2.0]]))
        np.testing.assert_allclose(np.sort(np.asarray(r[0])), [1, 2], atol=1e-5)

    def test_cubic(self):
        # (x-1)(x-2)(x-3) = x³ -6x² +11x -6
        r = solve_cubic(jnp.array([[1.0, -6.0, 11.0, -6.0]]))
        np.testing.assert_allclose(np.sort(np.asarray(r[0])), [1, 2, 3], atol=1e-4)

    def test_cubic_one_real(self):
        # x³ + x = 0 has roots 0, ±i → one real root 0
        r = solve_cubic(jnp.array([[1.0, 0.0, 1.0, 0.0]]))
        assert np.isclose(np.asarray(r[0])[0], 0.0, atol=1e-5)

    def test_poly_roots(self):
        # (x-1)(x-2)(x+3)(x-5) coefficients
        c = np.poly([1.0, 2.0, -3.0, 5.0])
        r = poly_roots(jnp.array(c)[None])
        got = np.sort(np.asarray(r[0].real))
        np.testing.assert_allclose(got, [-3, 1, 2, 5], atol=1e-3)


class TestLinalg:
    def test_inverse_transformation(self, key):
        from kornia_tpu.geometry.liegroup import Se3
        T = Se3.random(key, (4,)).matrix()
        Tinv = L.inverse_transformation(T)
        np.testing.assert_allclose(T @ Tinv, jnp.broadcast_to(jnp.eye(4), (4, 4, 4)),
                                   atol=1e-5)

    def test_relative(self, key):
        from kornia_tpu.geometry.liegroup import Se3
        k1, k2 = jax.random.split(key)
        T1 = Se3.random(k1, (4,)).matrix()
        T2 = Se3.random(k2, (4,)).matrix()
        T12 = L.relative_transformation(T1, T2)
        np.testing.assert_allclose(T1 @ T12, T2, atol=1e-4)

    def test_transform_points(self, key):
        pts = jax.random.normal(key, (2, 5, 3))
        T = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
        np.testing.assert_allclose(L.transform_points(T, pts), pts, atol=1e-6)


class TestHomographyEstimation:
    def test_dlt_exact(self, key):
        k1, k2 = jax.random.split(key)
        H_true = jnp.eye(3) + 0.1 * jax.random.normal(k1, (4, 3, 3))
        H_true = H_true / H_true[..., 2:, 2:]
        p1 = jax.random.uniform(k2, (4, 16, 2)) * 100
        p2 = L.transform_points(H_true, p1)
        H_est = Hm.find_homography_dlt(p1, p2)
        np.testing.assert_allclose(H_est, H_true, atol=1e-3)

    def test_dlt_weights_ignore_outliers(self, key):
        k1, k2 = jax.random.split(key)
        H_true = jnp.eye(3)[None]
        p1 = jax.random.uniform(k2, (1, 16, 2)) * 100
        p2 = L.transform_points(H_true, p1)
        p2 = p2.at[:, :4].add(50.0)  # corrupt 4 points
        w = jnp.ones((1, 16)).at[:, :4].set(0.0)
        H_est = Hm.find_homography_dlt(p1, p2, w)
        np.testing.assert_allclose(H_est, H_true, atol=1e-3)

    def test_sample_validity(self):
        good1 = jnp.array([[[0.0, 0], [1, 0], [1, 1], [0, 1]]])
        good2 = good1 + 0.1
        assert bool(Hm.sample_is_valid_for_homography(good1, good2)[0])
        # reflection flips orientation
        bad2 = good1.at[..., 0].multiply(-1.0)
        assert not bool(Hm.sample_is_valid_for_homography(good1, bad2)[0])


class TestEpipolar:
    def test_8point(self, key):
        s = make_scene(key)
        F = Ep.run_8point(s["x1"], s["x2"])
        d = Ep.sampson_epipolar_distance(s["x1"], s["x2"], F)
        assert float(d.max()) < 1e-4

    def test_7point(self, key):
        s = make_scene(key, N=7)
        F7 = Ep.run_7point(s["x1"], s["x2"])
        best = None
        for i in range(3):
            d = Ep.sampson_epipolar_distance(s["x1"], s["x2"], F7[:, i])
            best = d if best is None else jnp.minimum(best, d)
        assert float(best.max()) < 1e-3

    def test_5point(self, key):
        s = make_scene(key, B=8)
        x1n = C.normalize_points_with_intrinsics(s["x1"], s["K"])
        x2n = C.normalize_points_with_intrinsics(s["x2"], s["K"])
        E = Ep.run_5point(x1n[:, :5], x2n[:, :5])
        NC = E.shape[1]
        res = jnp.stack(
            [Ep.sampson_epipolar_distance(x1n, x2n, E[:, i]).max(-1)
             for i in range(NC)], -1)
        valid = jnp.linalg.norm(E.reshape(8, NC, 9), axis=-1) > 0.5
        best = jnp.where(valid, res, jnp.inf).min(-1)
        assert float(jnp.median(best)) < 1e-6
        assert float(best.max()) < 0.05

    def test_triangulation(self, key):
        s = make_scene(key)
        Xt = Ep.triangulate_points(s["P1"], s["P2"], s["x1"], s["x2"])
        np.testing.assert_allclose(Xt, s["X"], atol=1e-2)

    def test_motion_from_essential(self, key):
        s = make_scene(key)
        E = Ep.essential_from_Rt(
            jnp.broadcast_to(jnp.eye(3), s["R"].shape), jnp.zeros_like(s["t"]),
            s["R"], s["t"])
        R, t, X3d = Ep.motion_from_essential_choose_solution(
            E, s["K"], s["K"], s["x1"], s["x2"])
        np.testing.assert_allclose(R, s["R"], atol=1e-3)
        t_dir = s["t"][..., 0] / jnp.linalg.norm(s["t"][..., 0], axis=-1,
                                                 keepdims=True)
        tr_dir = t[..., 0] / jnp.linalg.norm(t[..., 0], axis=-1, keepdims=True)
        agree = jnp.minimum(jnp.abs(tr_dir - t_dir).max(-1),
                            jnp.abs(tr_dir + t_dir).max(-1))
        assert float(agree.max()) < 1e-2

    def test_fundamental_from_projections(self, key):
        s = make_scene(key)
        F = Ep.fundamental_from_projections(s["P1"], s["P2"])
        d = Ep.sampson_epipolar_distance(s["x1"], s["x2"], F)
        assert float(d.max()) < 1e-3

    def test_KRt_from_projection(self, key):
        s = make_scene(key)
        K, R, t = Ep.KRt_from_projection(s["P2"])
        np.testing.assert_allclose(K, s["K"], atol=1e-2)
        np.testing.assert_allclose(R, s["R"], atol=1e-3)
        np.testing.assert_allclose(t, s["t"], atol=1e-2)

    def test_epilines(self, key):
        s = make_scene(key)
        F = Ep.run_8point(s["x1"], s["x2"])
        lines = Ep.compute_correspond_epilines(s["x1"], F)
        # x2 must lie on its epiline
        d = jnp.abs(jnp.sum(lines[..., :2] * s["x2"], -1) + lines[..., 2])
        assert float(d.max()) < 1e-2


class TestRansac:
    def test_homography_with_outliers(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        H_true = jnp.array([[1.1, 0.02, 5.0], [-0.01, 0.95, -3.0], [1e-4, 0, 1.0]])
        p1 = jax.random.uniform(k1, (100, 2)) * 100
        p2 = L.transform_points(H_true[None], p1[None])[0]
        # corrupt 30% with gross outliers
        outl = jax.random.uniform(k2, (30, 2)) * 100
        p2 = p2.at[:30].set(outl)
        from kornia_tpu.geometry.ransac import ransac
        res = ransac(p1, p2, k3, "homography", inl_th=1.0, batch_size=512,
                     max_iterations=8)
        assert int(res.inlier_count) >= 65
        err = Hm.oneway_transfer_error(p1[None, 30:], p2[None, 30:],
                                       res.model[None], squared=False)
        assert float(jnp.median(err)) < 1.0

    def test_fundamental_ransac(self, key):
        s = make_scene(key, B=1, N=100, noise=0.2)
        k3 = jax.random.fold_in(key, 3)
        x1, x2 = s["x1"][0], s["x2"][0]
        x2 = x2.at[:20].add(30.0)  # outliers
        from kornia_tpu.geometry.ransac import ransac
        res = ransac(x1, x2, k3, "fundamental", inl_th=2.0, batch_size=256,
                     max_iterations=8)
        assert int(res.inlier_count) >= 60

    def test_padded_mask(self, key):
        k1, k3 = jax.random.split(key)
        H_true = jnp.eye(3)
        p1 = jax.random.uniform(k1, (64, 2)) * 100
        p2 = p1
        mask = jnp.arange(64) < 40  # last 24 are "padding"
        from kornia_tpu.geometry.ransac import ransac
        res = ransac(p1, p2, k3, "homography", inl_th=2.0, batch_size=128,
                     max_iterations=4, mask=mask)
        assert int(res.inlier_count) <= 40
        np.testing.assert_allclose(res.model / res.model[2, 2], jnp.eye(3),
                                   atol=1e-3)


class TestSubpix:
    def test_nms2d(self):
        from kornia_tpu.geometry.subpix import nms2d
        x = jnp.zeros((1, 1, 5, 5)).at[0, 0, 2, 2].set(1.0).at[0, 0, 2, 3].set(0.5)
        out = nms2d(x)
        assert float(out[0, 0, 2, 2]) == 1.0
        assert float(out[0, 0, 2, 3]) == 0.0

    def test_spatial_soft_argmax(self):
        from kornia_tpu.geometry.subpix import spatial_soft_argmax2d
        x = jnp.zeros((1, 1, 9, 9)).at[0, 0, 2, 6].set(10.0)
        out = spatial_soft_argmax2d(x, temperature=10.0)
        # peak at col 6 of 9 → x = 0.5; row 2 of 9 → y = -0.5
        np.testing.assert_allclose(out[0, 0], [0.5, -0.5], atol=0.05)

    def test_conv_soft_argmax2d(self):
        from kornia_tpu.geometry.subpix import conv_soft_argmax2d
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 8, 8))
        coords = conv_soft_argmax2d(x)
        assert coords.shape == (1, 1, 2, 8, 8)

    def test_conv_quad_interp3d(self):
        from kornia_tpu.geometry.subpix import conv_quad_interp3d
        # paraboloid peak offset from grid point
        D, H, W = 5, 9, 9
        zs, ys, xs = jnp.meshgrid(jnp.arange(D, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32),
                                  jnp.arange(W, dtype=jnp.float32), indexing="ij")
        peak = (2.0, 4.3, 4.7)  # (s, y, x)
        resp = -((zs - peak[0]) ** 2 + (ys - peak[1]) ** 2 + (xs - peak[2]) ** 2)
        resp = resp[None, None]
        coords, vals = conv_quad_interp3d(resp, strict_maxima_bonus=0.0)
        # at integer voxel (2, 4, 5), refined coords should be near true peak
        cx = float(coords[0, 0, 0, 2, 4, 5])
        cy = float(coords[0, 0, 1, 2, 4, 5])
        np.testing.assert_allclose([cx, cy], [4.7, 4.3], atol=0.05)


class TestCamera:
    def test_project_unproject(self, key):
        from kornia_tpu.geometry.camera import project_points, unproject_points
        K = jnp.array([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])
        pts = jax.random.normal(key, (10, 3)) + jnp.array([0, 0, 5.0])
        uv = project_points(pts, K)
        back = unproject_points(uv, pts[..., 2], K)
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_pinhole_camera(self, key):
        from kornia_tpu.geometry.camera import PinholeCamera
        cam = PinholeCamera.from_parameters(
            jnp.full((2,), 100.0), 100.0, 64.0, 48.0, 96, 128, 1.0, 0.0, 0.0)
        pts = jax.random.normal(key, (2, 7, 3)) + jnp.array([0, 0, 5.0])
        uv = cam.project(pts)
        assert uv.shape == (2, 7, 2)
        # depth in camera frame
        pc = jnp.einsum("bij,bnj->bni", cam.rotation_matrix, pts) + \
            cam.translation_vector[..., 0][:, None, :]
        back = cam.unproject(uv, pc[..., 2])
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_kannala_brandt_roundtrip(self, key):
        from kornia_tpu.geometry.camera import (
            distort_points_kannala_brandt, undistort_points_kannala_brandt)
        params = jnp.array([300.0, 300.0, 320.0, 240.0, 0.1, -0.05, 0.01, -0.001])
        pts = jax.random.normal(key, (20, 2)) * 0.3
        uv = distort_points_kannala_brandt(pts, params)
        back = undistort_points_kannala_brandt(uv, params)
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_stereo(self):
        from kornia_tpu.geometry.camera import StereoCamera
        fx, fy, cx, cy, tx = 100.0, 100.0, 64.0, 48.0, 0.5
        PL = jnp.array([[[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]]])
        PR = jnp.array([[[fx, 0, cx, -fx * tx], [0, fy, cy, 0], [0, 0, 1, 0]]])
        rig = StereoCamera(PL, PR)
        np.testing.assert_allclose(rig.tx, tx, rtol=1e-5)
        disp = jnp.full((1, 1, 4, 4), 10.0)
        pts = rig.reproject_disparity_to_3D(disp)
        # z = fx * tx / disp
        np.testing.assert_allclose(pts[..., 2], fx * tx / 10.0, rtol=1e-4)


class TestCalibration:
    def test_pnp_dlt(self, key):
        s = make_scene(key, B=3, N=12)
        from kornia_tpu.geometry.calibration import solve_pnp_dlt
        Rt = solve_pnp_dlt(s["X"], s["x2"], s["K"])
        np.testing.assert_allclose(Rt[:, :, :3], s["R"], atol=1e-2)
        np.testing.assert_allclose(Rt[:, :, 3:], s["t"], atol=5e-2)

    def test_distort_undistort(self, key):
        from kornia_tpu.geometry.calibration import distort_points, undistort_points
        K = jnp.array([[[100.0, 0, 64], [0, 100, 48], [0, 0, 1]]])
        dist = jnp.array([[0.1, -0.05, 0.001, 0.001, 0.01]])
        pts = jax.random.uniform(key, (1, 20, 2)) * 40 + 40
        pd = distort_points(pts, K, dist)
        back = undistort_points(pd, K, dist)
        np.testing.assert_allclose(back, pts, atol=0.05)


class TestDepth:
    def test_depth_to_3d(self):
        from kornia_tpu.geometry.depth import depth_to_3d
        K = jnp.array([[100.0, 0, 4], [0, 100, 4], [0, 0, 1]])
        depth = jnp.full((1, 1, 9, 9), 2.0)
        pts = depth_to_3d(depth, K)
        assert pts.shape == (1, 3, 9, 9)
        np.testing.assert_allclose(pts[0, 2], 2.0, atol=1e-5)
        # center pixel maps to (0, 0, z)
        np.testing.assert_allclose(pts[0, :2, 4, 4], 0.0, atol=1e-5)

    def test_depth_to_normals(self):
        from kornia_tpu.geometry.depth import depth_to_normals
        K = jnp.array([[100.0, 0, 4], [0, 100, 4], [0, 0, 1]])
        depth = jnp.full((1, 1, 9, 9), 2.0)
        n = depth_to_normals(depth, K)
        # flat depth → normal along z
        np.testing.assert_allclose(jnp.abs(n[0, 2, 4, 4]), 1.0, atol=0.1)

    def test_warp_frame_depth_identity(self, key):
        from kornia_tpu.geometry.depth import warp_frame_depth
        K = jnp.array([[[20.0, 0, 4], [0, 20.0, 4], [0, 0, 1]]])
        img = jax.random.uniform(key, (1, 1, 9, 9))
        depth = jnp.full((1, 1, 9, 9), 2.0)
        out = warp_frame_depth(img, depth, jnp.eye(4)[None], K)
        np.testing.assert_allclose(out, img, atol=1e-3)


class TestPolishEssential:
    def test_polish_tightens_5point_candidates(self, key):
        s = make_scene(key, B=8)
        x1n = C.normalize_points_with_intrinsics(s["x1"], s["K"])
        x2n = C.normalize_points_with_intrinsics(s["x2"], s["K"])
        p1, p2 = x1n[:, :5], x2n[:, :5]
        E = Ep.run_5point(p1, p2)
        Ep_pol = Ep.polish_essential(E, p1, p2, iters=3)

        def best(Em):
            NC = Em.shape[1]
            res = jnp.stack(
                [Ep.sampson_epipolar_distance(p1, p2, Em[:, i]).max(-1)
                 for i in range(NC)], -1)
            valid = jnp.linalg.norm(Em.reshape(8, NC, 9), axis=-1) > 0.5
            return jnp.where(valid, res, jnp.inf).min(-1)

        b0, b1 = best(E), best(Ep_pol)
        assert float(jnp.median(b1)) <= float(jnp.median(b0)) + 1e-12
        assert float(b1.max()) < 1e-3
        # polished candidates remain essential: det == 0, two equal svals
        valid = jnp.linalg.norm(Ep_pol.reshape(8, -1, 9), axis=-1) > 0.5
        dets = jnp.abs(jnp.linalg.det(Ep_pol))
        assert float(jnp.where(valid, dets, 0.0).max()) < 1e-5
        sv = jnp.linalg.svd(Ep_pol, compute_uv=False)
        gap = jnp.abs(sv[..., 0] - sv[..., 1])
        assert float(jnp.where(valid, gap, 0.0).max()) < 1e-4

    def test_5point_never_returns_empty_candidate_set(self, key):
        # degenerate-ish minimal samples must still yield >= 1 candidate
        ks = jax.random.split(key, 16)
        p1 = jax.random.normal(ks[0], (16, 5, 2)) * 0.4
        p2 = p1 + 0.05 * jax.random.normal(ks[1], (16, 5, 2))
        E = Ep.run_5point(p1, p2)
        valid = jnp.linalg.norm(E.reshape(16, -1, 9), axis=-1) > 0.5
        assert bool(jnp.all(jnp.any(valid, -1)))


class TestNullspaceQR:
    def test_orthonormal_and_annihilating(self, key):
        from kornia_tpu.core.linalg import nullspace_qr
        A = jax.random.normal(key, (200, 5, 9))
        V = jax.jit(nullspace_qr)(A)
        av = jnp.abs(jnp.einsum("brc,bcn->brn", A, V)).max()
        assert float(av) < 5e-6
        G = jnp.einsum("bcn,bcm->bnm", V, V)
        assert float(jnp.abs(G - jnp.eye(4)).max()) < 5e-6

    def test_rank_deficient_rows(self, key):
        from kornia_tpu.core.linalg import nullspace_qr
        A = jax.random.normal(key, (64, 5, 9))
        A = A.at[:, 4].set(A[:, 3] * (1.0 + 1e-7))  # nearly repeated row
        V = jax.jit(nullspace_qr)(A)
        assert float(jnp.abs(jnp.einsum("brc,bcn->brn", A, V)).max()) < 5e-6
        G = jnp.einsum("bcn,bcm->bnm", V, V)
        assert float(jnp.abs(G - jnp.eye(4)).max()) < 5e-6

    def test_5point_worst_case_residual_tail(self, key):
        """eigh(AᵀA) nullspaces lost the true E from the basis span on
        ~0.1% of minimal samples (worst epipolar residual 1.5e-3); the
        Householder-QR nullspace closes the tail to <2e-6 (regression
        for the round-1 known-tail)."""
        from kornia_tpu.geometry.liegroup import So3
        B = 1024
        k1, k2, k3 = jax.random.split(key, 3)
        R = So3.exp(jax.random.normal(k1, (B, 3)) * 0.3).matrix()
        t = jax.random.normal(k2, (B, 3))
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        X = jax.random.normal(k3, (B, 5, 3)) * jnp.asarray([1.0, 1.0, 0.2])
        X = X + jnp.asarray([0.0, 0.0, 4.0])
        x1 = X[..., :2] / X[..., 2:]
        Xc = jnp.einsum("bij,bnj->bni", R, X) + t[:, None]
        x2 = Xc[..., :2] / Xc[..., 2:]
        E = jax.jit(Ep.run_5point)(x1, x2)
        h1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
        h2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], -1)
        res = jnp.abs(jnp.einsum("bni,brij,bnj->brn", h2, E, h1))
        valid = jnp.any(E.reshape(B, E.shape[1], 9) != 0, axis=-1)
        worst_pt = jnp.where(valid[..., None], res, jnp.inf).max(-1)
        best = jnp.min(worst_pt, axis=-1)  # best candidate per sample
        assert float(best.max()) < 1e-5


class TestStreamingMsacScorer:
    def test_chunked_matches_direct(self, key):
        """The streaming scorer (used when models x points would blow HBM —
        e.g. essential RANSAC at the reference's 2048x10x10 scale needs
        ~22 GB direct) must reproduce the direct path bit-for-bit."""
        import numpy as np

        import kornia_tpu.geometry.ransac as R
        rng = np.random.default_rng(7)
        p1 = jnp.asarray(rng.normal(size=(257, 2)), jnp.float32)
        p2 = jnp.asarray(rng.normal(size=(257, 2)), jnp.float32)
        models = jnp.asarray(rng.normal(size=(300, 3, 3)), jnp.float32)
        mask = jnp.asarray(rng.random(257) > 0.3)
        th2 = 0.05
        want = R._msac_scores("essential", p1, p2, models, mask, th2)
        old = R._STREAM_THRESHOLD
        try:
            R._STREAM_THRESHOLD = 1024
            got = R._msac_scores("essential", p1, p2, models, mask, th2)
        finally:
            R._STREAM_THRESHOLD = old
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[1]),
                                      np.asarray(want[1]))
