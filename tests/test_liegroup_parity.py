"""Lie-group / quaternion / camera output sweeps against the reference
(VERDICT r2 item 7; reference: kornia/geometry/liegroup/{so3,se3,so2,se2}.py,
kornia/geometry/quaternion.py, kornia/geometry/camera/pinhole ops).

Each sweep drives BOTH libraries with the same random batch and compares
raw outputs — not just algebraic identities."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")
kornia = pytest.importorskip("kornia")

import jax
import jax.numpy as jnp

from kornia_tpu.geometry.liegroup import Quaternion, Se3, So3

rng = np.random.default_rng(123)
B = 16
V3 = (rng.standard_normal((B, 3)) * 1.2).astype(np.float32)
V6 = (rng.standard_normal((B, 6)) * 0.8).astype(np.float32)
T3 = rng.standard_normal((B, 3)).astype(np.float32)
PTS = rng.standard_normal((B, 3)).astype(np.float32)


def t(a):
    return torch.from_numpy(np.asarray(a))


def close(ours, ref, atol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=atol, rtol=1e-4)


class TestSo3Sweep:
    def test_exp_matrix(self):
        from kornia.geometry.liegroup import So3 as RefSo3
        close(So3.exp(jnp.asarray(V3)).matrix(),
              RefSo3.exp(t(V3)).matrix())

    def test_exp_log_roundtrip_matches(self):
        from kornia.geometry.liegroup import So3 as RefSo3
        close(So3.exp(jnp.asarray(V3)).log(), RefSo3.exp(t(V3)).log())

    def test_mul_and_inverse(self):
        from kornia.geometry.liegroup import So3 as RefSo3
        a = So3.exp(jnp.asarray(V3))
        b = So3.exp(jnp.asarray(V3[::-1].copy()))
        ra = RefSo3.exp(t(V3))
        rb = RefSo3.exp(t(V3[::-1].copy()))
        close((a * b).matrix(), (ra * rb).matrix())
        close(a.inverse().matrix(), ra.inverse().matrix())

    def test_act_on_points(self):
        from kornia.geometry.liegroup import So3 as RefSo3
        close(So3.exp(jnp.asarray(V3)).act(jnp.asarray(PTS)),
              RefSo3.exp(t(V3)) * t(PTS))

    def test_hat_vee(self):
        from kornia.geometry.liegroup import So3 as RefSo3
        close(So3.hat(jnp.asarray(V3)), RefSo3.hat(t(V3)))
        omega = np.asarray(So3.hat(jnp.asarray(V3)))
        close(So3.vee(jnp.asarray(omega)), RefSo3.vee(t(omega)))


class TestSe3Sweep:
    def test_exp_matrix(self):
        from kornia.geometry.liegroup import Se3 as RefSe3
        close(Se3.exp(jnp.asarray(V6)).matrix(),
              RefSe3.exp(t(V6)).matrix(), atol=1e-4)

    def test_exp_log_roundtrip_matches(self):
        from kornia.geometry.liegroup import Se3 as RefSe3
        close(Se3.exp(jnp.asarray(V6)).log(), RefSe3.exp(t(V6)).log(),
              atol=1e-4)

    def test_mul_inverse_act(self):
        from kornia.geometry.liegroup import Se3 as RefSe3
        a = Se3.exp(jnp.asarray(V6))
        b = Se3.exp(jnp.asarray(V6[::-1].copy()))
        ra = RefSe3.exp(t(V6))
        rb = RefSe3.exp(t(V6[::-1].copy()))
        close((a * b).matrix(), (ra * rb).matrix(), atol=1e-4)
        close(a.inverse().matrix(), ra.inverse().matrix(), atol=1e-4)
        close(a.act(jnp.asarray(PTS)), ra * t(PTS), atol=1e-4)


class TestQuaternionSweep:
    def test_from_axis_angle_and_matrix(self):
        from kornia.geometry.quaternion import Quaternion as RefQ
        q = Quaternion.from_axis_angle(jnp.asarray(V3))
        rq = RefQ.from_axis_angle(t(V3))
        # sign-canonicalize: q and -q are the same rotation
        ours = np.asarray(q.data)
        ref = rq.data.detach().numpy()
        sign = np.sign(ours[:, :1] * ref[:, :1])
        sign[sign == 0] = 1.0
        np.testing.assert_allclose(ours * sign, ref, atol=1e-5)
        close(q.matrix(), rq.matrix())

    def test_mul_conj_norm(self):
        from kornia.geometry.quaternion import Quaternion as RefQ
        qa = Quaternion.from_axis_angle(jnp.asarray(V3))
        qb = Quaternion.from_axis_angle(jnp.asarray(V3[::-1].copy()))
        ra = RefQ.from_axis_angle(t(V3))
        rb = RefQ.from_axis_angle(t(V3[::-1].copy()))
        close((qa * qb).data, (ra * rb).data)
        close(qa.conj().data, ra.conj().data)
        close(qa.norm(), ra.norm())

    def test_slerp(self):
        from kornia.geometry.quaternion import Quaternion as RefQ
        qa = Quaternion.from_axis_angle(jnp.asarray(0.3 * V3))
        qb = Quaternion.from_axis_angle(jnp.asarray(0.7 * V3))
        ra = RefQ.from_axis_angle(t(0.3 * V3))
        rb = RefQ.from_axis_angle(t(0.7 * V3))
        close(qa.slerp(qb, 0.25).data, ra.slerp(rb, 0.25).data, atol=1e-4)


class TestCameraSweep:
    def test_project_unproject_points(self):
        import kornia.geometry.camera as KCam

        from kornia_tpu.geometry.camera import (project_points,
                                                unproject_points)
        pts = (rng.standard_normal((B, 3)) * 0.5
               + np.array([0, 0, 4.0])).astype(np.float32)
        K = np.array([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]], np.float32)
        Kb = np.broadcast_to(K, (B, 3, 3)).copy()
        ours = project_points(jnp.asarray(pts), jnp.asarray(Kb))
        ref = KCam.project_points(t(pts), t(Kb))
        close(ours, ref, atol=1e-4)
        depth = pts[:, 2:]
        ours_up = unproject_points(ours, jnp.asarray(depth),
                                   jnp.asarray(Kb))
        ref_up = KCam.unproject_points(ref, t(depth), t(Kb))
        close(ours_up, ref_up, atol=1e-4)

    def test_distort_undistort_points(self):
        import kornia.geometry.calibration as KCal

        from kornia_tpu.geometry.calibration import (distort_points,
                                                     undistort_points)
        pts = (rng.uniform(20, 100, (1, B, 2))).astype(np.float32)
        K = np.array([[[100.0, 0, 64], [0, 100, 48], [0, 0, 1]]], np.float32)
        dist = np.zeros((1, 14), np.float32)
        dist[0, :5] = [0.1, -0.05, 0.001, 0.002, 0.01]
        ours = distort_points(jnp.asarray(pts), jnp.asarray(K),
                              jnp.asarray(dist))
        ref = KCal.distort_points(t(pts), t(K), t(dist))
        close(ours, ref, atol=1e-3)
        ours_u = undistort_points(jnp.asarray(ours), jnp.asarray(K),
                                  jnp.asarray(dist))
        ref_u = KCal.undistort_points(t(np.asarray(ours)), t(K), t(dist))
        close(ours_u, ref_u, atol=1e-3)


class TestRansacStatisticalRecovery:
    """Known inlier ratio -> success probability (VERDICT r2 item 7:
    'RANSAC has no statistical-recovery test')."""

    @pytest.mark.parametrize("inlier_ratio", [0.8, 0.5])
    def test_homography_recovery_rate(self, inlier_ratio):
        from kornia_tpu.geometry.ransac import ransac

        n_trials = 12
        N = 200
        success = 0
        for trial in range(n_trials):
            r = np.random.default_rng(100 + trial)
            H_true = np.array([[1.1, 0.05, 8.0], [-0.04, 0.95, -5.0],
                               [1e-4, -2e-4, 1.0]], np.float32)
            p1 = r.uniform(0, 200, (N, 2)).astype(np.float32)
            ph = np.concatenate([p1, np.ones((N, 1), np.float32)], 1)
            p2 = (ph @ H_true.T)
            p2 = p2[:, :2] / p2[:, 2:]
            p2 += r.normal(0, 0.5, p2.shape)
            out = r.random(N) > inlier_ratio
            p2[out] = r.uniform(0, 200, (int(out.sum()), 2))
            res = jax.jit(lambda a, b, k: ransac(
                a, b, k, "homography", inl_th=3.0, batch_size=256,
                max_iterations=8))(jnp.asarray(p1), jnp.asarray(p2),
                                   jax.random.PRNGKey(trial))
            inl = np.asarray(res.inliers)
            true_inl = ~out
            recall = (inl & true_inl).sum() / max(true_inl.sum(), 1)
            precision = (inl & true_inl).sum() / max(inl.sum(), 1)
            if recall > 0.8 and precision > 0.9:
                success += 1
        # theoretical success per trial >= 99% at these settings; allow
        # one flaky trial
        assert success >= n_trials - 1, (inlier_ratio, success)
