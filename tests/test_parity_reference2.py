"""Reference-parity batch 2: the corners the round-3 parity suite did not
reach (VERDICT r3 item 4 — "parity legs for the remaining untested
aug/geometry corners"). Same harness as test_parity_reference.py: identical
inputs through kornia (torch CPU) and kornia_tpu (jax CPU).
"""

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

import kornia_tpu as kt

rng = np.random.default_rng(7)


def t(a):
    return torch.from_numpy(np.asarray(a))


def j(a):
    return jnp.asarray(np.asarray(a))


def allclose(ours, ref, atol=1e-5, rtol=1e-4):
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                               atol=atol, rtol=rtol)


IMG = rng.random((2, 3, 24, 24)).astype(np.float32)
GRAY = rng.random((2, 1, 24, 24)).astype(np.float32)


class TestMorphologyParity:
    SE = (rng.random((5, 5)) > 0.4).astype(np.float32)

    @pytest.mark.parametrize("name", [
        "dilation", "erosion", "opening", "closing", "gradient",
        "top_hat", "bottom_hat"])
    def test_ops(self, name):
        ours = getattr(kt.morphology, name)(j(GRAY), j(self.SE))
        ref = getattr(kornia.morphology, name)(t(GRAY), t(self.SE))
        allclose(ours, ref, atol=1e-5)

    def test_non_flat_se(self):
        se = rng.random((3, 3)).astype(np.float32)
        ours = kt.morphology.dilation(j(GRAY), j(se), structuring_element=None)
        ref = kornia.morphology.dilation(t(GRAY), t(se))
        allclose(ours, ref, atol=1e-5)


class TestEnhanceParity2:
    def test_equalize_clahe(self):
        ours = kt.ops.equalize_clahe(j(IMG), clip_limit=40.0,
                                     grid_size=(2, 2))
        ref = kornia.enhance.equalize_clahe(t(IMG), clip_limit=40.0,
                                            grid_size=(2, 2))
        allclose(ours, ref, atol=2e-3)

    def test_adjust_sigmoid(self):
        ours = kt.ops.adjust_sigmoid(j(IMG), cutoff=0.4, gain=9.0)
        ref = kornia.enhance.adjust_sigmoid(t(IMG), cutoff=0.4, gain=9.0)
        allclose(ours, ref, atol=1e-5)

    def test_adjust_log(self):
        ours = kt.ops.adjust_log(j(IMG), gain=0.8)
        ref = kornia.enhance.adjust_log(t(IMG), gain=0.8)
        allclose(ours, ref, atol=1e-5)

    def test_invert(self):
        ours = kt.ops.invert(j(IMG))
        ref = kornia.enhance.invert(t(IMG))
        allclose(ours, ref, atol=1e-6)

    def test_zca(self):
        data = rng.random((40, 6)).astype(np.float32)
        zca_t = kornia.enhance.ZCAWhitening(eps=1e-3).fit(t(data))
        ref = zca_t(t(data))
        from kornia_tpu.ops.enhance import zca_whiten
        ours = zca_whiten(j(data), eps=1e-3)
        allclose(ours, ref, atol=2e-3)

    def test_histogram(self):
        bins = torch.linspace(0, 1, 10)
        ref = kornia.enhance.histogram(t(GRAY).reshape(2, -1), bins,
                                       torch.tensor(0.01))
        from kornia_tpu.ops.enhance import histogram
        ours = histogram(j(GRAY).reshape(2, -1),
                         j(np.linspace(0, 1, 10, dtype=np.float32)),
                         0.01)
        allclose(ours, ref, atol=1e-5)

    def test_histogram2d(self):
        bins = torch.linspace(0, 1, 8)
        x1 = t(GRAY).reshape(2, -1)
        x2 = t(1.0 - GRAY).reshape(2, -1)
        ref = kornia.enhance.histogram2d(x1, x2, bins, torch.tensor(0.02))
        from kornia_tpu.ops.enhance import histogram2d
        ours = histogram2d(j(GRAY).reshape(2, -1),
                           j(1.0 - GRAY).reshape(2, -1),
                           j(np.linspace(0, 1, 8, dtype=np.float32)), 0.02)
        allclose(ours, ref, atol=1e-5)


class TestFilterParity2:
    def test_bilateral_blur(self):
        ours = kt.ops.bilateral_blur(j(IMG), 5, 0.1, (1.5, 1.5))
        ref = kornia.filters.bilateral_blur(t(IMG), 5, 0.1, (1.5, 1.5))
        allclose(ours, ref, atol=1e-4)

    def test_canny_magnitude(self):
        ours_mag, ours_edge = kt.ops.canny(j(GRAY))
        ref_mag, ref_edge = kornia.filters.canny(t(GRAY))
        allclose(ours_mag, ref_mag, atol=1e-4)
        # hysteresis: allow a tiny count of boundary-threshold flips
        diff = np.abs(np.asarray(ours_edge)
                      - ref_edge.detach().numpy()).sum()
        assert diff <= 4, diff

    def test_blur_pool(self):
        ours = kt.ops.blur_pool2d(j(IMG), 3)
        ref = kornia.filters.blur_pool2d(t(IMG), 3)
        allclose(ours, ref, atol=1e-5)

    def test_max_blur_pool(self):
        from kornia_tpu.ops.filters import max_blur_pool2d
        ours = max_blur_pool2d(j(IMG), 3)
        ref = kornia.filters.max_blur_pool2d(t(IMG), 3)
        allclose(ours, ref, atol=1e-5)

    def test_max_blur_pool_ceil_mode(self):
        # ceil_mode is a stride-1 no-op in torch; shapes+values must match
        # (ADVICE r4: our old edge-pad branch produced 17x17 vs ref 16x16
        # at H=W=33).
        from kornia_tpu.ops.filters import max_blur_pool2d
        img = np.random.RandomState(7).rand(1, 3, 33, 33).astype(np.float32)
        ours = max_blur_pool2d(j(img), 3, ceil_mode=True)
        ref = kornia.filters.max_blur_pool2d(t(img), 3, ceil_mode=True)
        assert tuple(ours.shape) == tuple(ref.shape), (ours.shape, ref.shape)
        allclose(ours, ref, atol=1e-5)

    def test_guided_blur(self):
        from kornia_tpu.ops.filters import guided_blur
        ours = guided_blur(j(GRAY), j(IMG), 5, 0.01)
        ref = kornia.filters.guided_blur(t(GRAY), t(IMG), 5, 0.01)
        allclose(ours, ref, atol=1e-4)

    def test_joint_bilateral(self):
        from kornia_tpu.ops.filters import joint_bilateral_blur
        ours = joint_bilateral_blur(j(IMG), j(GRAY.repeat(3, 1)), 5, 0.1,
                                    (1.5, 1.5))
        ref = kornia.filters.joint_bilateral_blur(
            t(IMG), t(GRAY.repeat(3, 1)), 5, 0.1, (1.5, 1.5))
        allclose(ours, ref, atol=1e-4)


class TestWarpParity2:
    def test_elastic_transform(self):
        noise = (rng.random((2, 2, 24, 24)).astype(np.float32) - 0.5)
        ours = kt.ops.elastic_transform2d(j(IMG), j(noise), (9, 9),
                                          (2.0, 2.0), (0.5, 0.5))
        ref = kornia.geometry.transform.elastic_transform2d(
            t(IMG), t(noise), (9, 9), (2.0, 2.0), (0.5, 0.5))
        allclose(ours, ref, atol=2e-4)

    def test_thin_plate_spline(self):
        src = rng.random((1, 5, 2)).astype(np.float32)
        dst = (src + 0.05 * rng.standard_normal((1, 5, 2))).astype(
            np.float32)
        from kornia_tpu.ops.warp import (get_tps_transform,
                                         warp_points_tps)
        kw, aff = get_tps_transform(j(src), j(dst))
        kw_r, aff_r = kornia.geometry.transform.get_tps_transform(
            t(src), t(dst))
        allclose(kw, kw_r, atol=1e-3)
        allclose(aff, aff_r, atol=1e-3)
        pts = rng.random((1, 7, 2)).astype(np.float32)
        ours_p = warp_points_tps(j(pts), j(dst), kw, aff)
        ref_p = kornia.geometry.transform.warp_points_tps(
            t(pts), t(dst), kw_r, aff_r)
        allclose(ours_p, ref_p, atol=1e-3)

    def test_warp_affine3d(self):
        vol = rng.random((1, 1, 6, 10, 12)).astype(np.float32)
        M = np.eye(4, dtype=np.float32)[None, :3]
        M[0, :3, :3] = kornia.geometry.axis_angle_to_rotation_matrix(
            torch.tensor([[0.1, -0.05, 0.2]])).numpy()[0]
        M[0, :, 3] = [0.5, -0.3, 0.2]
        ours = kt.ops.warp3d.warp_affine3d(j(vol), j(M), (6, 10, 12))
        ref = kornia.geometry.transform.warp_affine3d(
            t(vol), t(M), (6, 10, 12))
        allclose(ours, ref, atol=1e-4)

    def test_rescale(self):
        from kornia_tpu.ops.warp import rescale
        ours = rescale(j(IMG), (1.5, 0.75))
        ref = kornia.geometry.transform.rescale(t(IMG), (1.5, 0.75))
        allclose(ours, ref, atol=1e-4)

    def test_resize_side(self):
        from kornia_tpu.ops.warp import resize
        ours = resize(j(IMG), 20, side="short")
        ref = kornia.geometry.transform.resize(t(IMG), 20, side="short")
        assert ours.shape == tuple(ref.shape)
        allclose(ours, ref, atol=1e-4)


class TestDepthParity:
    DEPTH = (1.0 + rng.random((1, 1, 16, 16))).astype(np.float32)
    K = np.array([[[50.0, 0, 8], [0, 50.0, 8], [0, 0, 1]]],
                 dtype=np.float32)

    def test_depth_to_3d(self):
        from kornia_tpu.geometry.depth import depth_to_3d_v2
        ours = depth_to_3d_v2(j(self.DEPTH[:, 0]), j(self.K))
        ref = kornia.geometry.depth.depth_to_3d_v2(
            t(self.DEPTH[:, 0]), t(self.K))
        allclose(ours, ref, atol=1e-4)

    def test_depth_to_normals(self):
        from kornia_tpu.geometry.depth import depth_to_normals
        ours = depth_to_normals(j(self.DEPTH), j(self.K))
        ref = kornia.geometry.depth.depth_to_normals(
            t(self.DEPTH), t(self.K))
        allclose(ours, ref, atol=1e-3)

    def test_depth_from_disparity(self):
        disp = (0.5 + rng.random((1, 1, 8, 8))).astype(np.float32)
        from kornia_tpu.geometry.depth import depth_from_disparity
        ours = depth_from_disparity(j(disp), baseline=0.5, focal=40.0)
        ref = kornia.geometry.depth.depth_from_disparity(
            t(disp), baseline=0.5, focal=40.0)
        allclose(ours, ref, atol=1e-4)


class TestLossParity2:
    PRED = rng.random((2, 4, 8, 8)).astype(np.float32)
    TGT = rng.integers(0, 4, (2, 8, 8))

    def test_tversky(self):
        from kornia_tpu.losses import tversky_loss
        ours = tversky_loss(j(self.PRED), j(self.TGT.astype(np.int32)),
                            alpha=0.4, beta=0.6)
        ref = kornia.losses.tversky_loss(t(self.PRED),
                                         t(self.TGT).long(), 0.4, 0.6)
        allclose(ours, ref, atol=1e-5)

    def test_lovasz_hinge(self):
        pred = rng.standard_normal((2, 1, 8, 8)).astype(np.float32)
        tgt = rng.integers(0, 2, (2, 8, 8))
        from kornia_tpu.losses import lovasz_hinge_loss
        ours = lovasz_hinge_loss(j(pred), j(tgt.astype(np.int32)))
        ref = kornia.losses.lovasz_hinge_loss(t(pred), t(tgt).long())
        allclose(ours, ref, atol=1e-5)

    def test_charbonnier(self):
        a = rng.random((2, 3, 8, 8)).astype(np.float32)
        b = rng.random((2, 3, 8, 8)).astype(np.float32)
        from kornia_tpu.losses import charbonnier_loss
        ours = charbonnier_loss(j(a), j(b), reduction="mean")
        ref = kornia.losses.charbonnier_loss(t(a), t(b),
                                             reduction="mean")
        allclose(ours, ref, atol=1e-5)

    def test_welsch(self):
        a = rng.random((2, 3, 8, 8)).astype(np.float32)
        b = rng.random((2, 3, 8, 8)).astype(np.float32)
        from kornia_tpu.losses import welsch_loss
        ours = welsch_loss(j(a), j(b), reduction="mean")
        ref = kornia.losses.welsch_loss(t(a), t(b), reduction="mean")
        allclose(ours, ref, atol=1e-5)

    def test_geman_mcclure(self):
        a = rng.random((2, 3, 8, 8)).astype(np.float32)
        b = rng.random((2, 3, 8, 8)).astype(np.float32)
        from kornia_tpu.losses import geman_mcclure_loss
        ours = geman_mcclure_loss(j(a), j(b), reduction="mean")
        ref = kornia.losses.geman_mcclure_loss(t(a), t(b),
                                               reduction="mean")
        allclose(ours, ref, atol=1e-5)


class TestFeatureParity2:
    def test_dog_response(self):
        # our detector layout is (B, L, C, H, W); the reference diffs a
        # (B, C, L, H, W) stack along dim 2 — transpose to compare
        stack = rng.random((1, 5, 1, 16, 16)).astype(np.float32)
        from kornia_tpu.feature.responses import dog_response
        ours = dog_response(j(stack))  # (B, L-1, C, H, W)
        ref = kornia.feature.dog_response(t(stack).permute(0, 2, 1, 3, 4))
        allclose(jnp.transpose(ours, (0, 2, 1, 3, 4)), ref, atol=1e-6)

    def test_dog_response_single(self):
        from kornia_tpu.feature.responses import dog_response_single
        ours = dog_response_single(j(GRAY), sigma1=1.0, sigma2=1.6)
        ref = kornia.feature.dog_response_single(t(GRAY), 1.0, 1.6)
        allclose(ours, ref, atol=1e-4)

    def test_laf_checks_and_conversions(self):
        laf = rng.random((1, 4, 2, 3)).astype(np.float32) * 10
        from kornia_tpu.feature.laf import (ellipse_to_laf,
                                            laf_to_three_points,
                                            laf_from_three_points)
        three = laf_to_three_points(j(laf))
        ref3 = kornia.feature.laf_to_three_points(t(laf))
        allclose(three, ref3, atol=1e-5)
        back = laf_from_three_points(three)
        refb = kornia.feature.laf_from_three_points(ref3)
        allclose(back, refb, atol=1e-4)

    def test_harris_at_odd_shape(self):
        img = rng.random((1, 1, 17, 23)).astype(np.float32)
        ours = kt.feature.harris_response(j(img), k=0.04)
        ref = kornia.feature.harris_response(t(img), k=0.04)
        allclose(ours, ref, atol=1e-5)


class TestConversionsParity2:
    def test_euler_quaternion_roundtrip(self):
        from kornia_tpu.geometry.conversions import (
            euler_from_quaternion, quaternion_from_euler)
        r, p, y = 0.2, -0.4, 1.1
        q = quaternion_from_euler(jnp.asarray(r), jnp.asarray(p),
                                  jnp.asarray(y))
        qr = kornia.geometry.conversions.quaternion_from_euler(
            torch.tensor(r), torch.tensor(p), torch.tensor(y))
        np.testing.assert_allclose(
            np.asarray(jnp.stack(q)),
            np.stack([x.numpy() for x in qr]), atol=1e-6)
        back = euler_from_quaternion(*q)
        np.testing.assert_allclose(np.asarray(jnp.stack(back)),
                                   [r, p, y], atol=1e-5)

    def test_Rt_to_matrix4x4(self):
        from kornia_tpu.geometry.conversions import (
            Rt_to_matrix4x4, matrix4x4_to_Rt)
        R = kornia.geometry.axis_angle_to_rotation_matrix(
            torch.tensor([[0.3, 0.1, -0.2]]))
        tt = torch.tensor([[[0.5], [1.0], [-0.3]]])
        ref = kornia.geometry.conversions.Rt_to_matrix4x4(R, tt)
        ours = Rt_to_matrix4x4(j(R.numpy()), j(tt.numpy()))
        allclose(ours, ref, atol=1e-6)
        R2, t2 = matrix4x4_to_Rt(ours)
        allclose(R2, R, atol=1e-6)

    def test_vector_to_skew(self):
        from kornia_tpu.geometry.conversions import (
            vector_to_skew_symmetric_matrix)
        v = torch.tensor([[0.1, -0.5, 2.0]])
        ref = kornia.geometry.conversions.vector_to_skew_symmetric_matrix(v)
        ours = vector_to_skew_symmetric_matrix(j(v.numpy()))
        allclose(ours, ref, atol=1e-7)
