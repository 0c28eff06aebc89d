import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.ops.warp as W
from kornia_tpu.core.grid import create_meshgrid


class TestGridSample:
    def test_identity(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        grid = jnp.broadcast_to(create_meshgrid(8, 8, True), (2, 8, 8, 2))
        out = W.grid_sample(x, grid, align_corners=True)
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_identity_nearest(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        grid = create_meshgrid(8, 8, True)
        out = W.grid_sample(x, grid, mode="nearest", align_corners=True)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_identity_bicubic(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        grid = create_meshgrid(8, 8, True)
        out = W.grid_sample(x, grid, mode="bicubic", align_corners=True)
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_zeros_padding(self, key):
        x = jnp.ones((1, 1, 4, 4))
        grid = jnp.full((1, 2, 2, 2), -2.0)  # far out of bounds
        out = W.grid_sample(x, grid, padding_mode="zeros")
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_border_padding(self, key):
        x = jnp.ones((1, 1, 4, 4))
        grid = jnp.full((1, 2, 2, 2), -2.0)
        out = W.grid_sample(x, grid, padding_mode="border")
        np.testing.assert_allclose(out, 1.0, atol=1e-6)

    def test_matches_torch(self, key):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF
        x = np.random.default_rng(0).random((2, 3, 9, 7)).astype(np.float32)
        g = (np.random.default_rng(1).random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2)
        for mode in ["bilinear", "nearest", "bicubic"]:
            for pad in ["zeros", "border", "reflection"]:
                for ac in [True, False]:
                    ours = W.grid_sample(jnp.array(x), jnp.array(g), mode, pad, ac)
                    ref = TF.grid_sample(torch.from_numpy(x), torch.from_numpy(g),
                                         mode=mode, padding_mode=pad,
                                         align_corners=ac).numpy()
                    np.testing.assert_allclose(
                        np.asarray(ours), ref, atol=2e-4,
                        err_msg=f"{mode}/{pad}/ac={ac}")

    def test_grad(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        grid = create_meshgrid(4, 4, True) * 0.5
        g = jax.grad(lambda t: jnp.sum(W.grid_sample(t, grid)))(x)
        assert bool(jnp.all(jnp.isfinite(g)))
        # grad w.r.t. grid too (needed for direct image alignment)
        gg = jax.grad(lambda gr: jnp.sum(W.grid_sample(x, gr)))(grid)
        assert bool(jnp.all(jnp.isfinite(gg)))


class TestWarpPerspective:
    def test_identity(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        M = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
        out = W.warp_perspective(x, M, (8, 8))
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_translation(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        M = jnp.eye(3).at[0, 2].set(2.0)[None]  # shift +2 px in x
        out = W.warp_perspective(x, M, (8, 8))
        np.testing.assert_allclose(out[0, 0, :, 2:], x[0, 0, :, :-2], atol=1e-4)

    def test_matches_torch_kornia_convention(self):
        # warp then inverse-warp returns original in the interior
        x = jnp.arange(64.0).reshape(1, 1, 8, 8) / 64.0
        angle = jnp.array([30.0])
        center = jnp.array([[3.5, 3.5]])
        M = W.get_rotation_matrix2d(center, angle, jnp.ones((1, 2)))
        out = W.warp_affine(x, M, (8, 8))
        Minv = W.invert_affine_transform(M)
        back = W.warp_affine(out, Minv, (8, 8))
        np.testing.assert_allclose(back[0, 0, 3:5, 3:5], x[0, 0, 3:5, 3:5], atol=0.05)

    def test_fill(self, key):
        x = jnp.zeros((1, 3, 6, 6))
        M = jnp.eye(3).at[0, 2].set(10.0)[None]
        out = W.warp_perspective(x, M, (6, 6), fill_value=jnp.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(out[0, :, 3, 3], [1.0, 2.0, 3.0], atol=1e-4)


class TestPerspectiveTransform:
    def test_four_point(self, key):
        src = jnp.array([[[0.0, 0.0], [7.0, 0.0], [7.0, 7.0], [0.0, 7.0]]])
        dst = src + jnp.array([[[1.0, 2.0]] * 4])
        M = W.get_perspective_transform(src, dst)
        expected = jnp.eye(3).at[0, 2].set(1.0).at[1, 2].set(2.0)
        np.testing.assert_allclose(M[0], expected, atol=1e-4)

    def test_random_quad(self, key):
        k1, k2 = jax.random.split(key)
        src = jax.random.uniform(k1, (4, 4, 2)) * 10
        dst = jax.random.uniform(k2, (4, 4, 2)) * 10
        M = W.get_perspective_transform(src, dst)
        mapped = W.transform_points(M, src)
        np.testing.assert_allclose(mapped, dst, atol=1e-2)


class TestRotationMatrix:
    def test_rot90_maps_points(self):
        center = jnp.array([[0.0, 0.0]])
        M = W.get_rotation_matrix2d(center, jnp.array([90.0]), jnp.ones((1, 2)))
        # OpenCV convention: positive angle = CCW in image coords, y down.
        pt = jnp.array([[[1.0, 0.0]]])
        H = jnp.concatenate([M, jnp.array([[[0.0, 0.0, 1.0]]])], axis=1)
        out = W.transform_points(H, pt)
        np.testing.assert_allclose(out[0, 0], [0.0, -1.0], atol=1e-5)


class TestCropResize:
    def test_center_crop(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        out = W.center_crop(x, (4, 4))
        np.testing.assert_allclose(out, x[:, :, 2:6, 2:6], atol=1e-6)

    def test_crop_and_resize(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        boxes = jnp.array([[[0.0, 0.0], [3.0, 0.0], [3.0, 3.0], [0.0, 3.0]]])
        out = W.crop_and_resize(x, boxes, (4, 4))
        np.testing.assert_allclose(out[0, 0], x[0, 0, :4, :4], atol=1e-4)

    def test_resize_up_down(self, key):
        x = jax.random.uniform(key, (1, 3, 8, 8))
        up = W.resize(x, (16, 16))
        assert up.shape == (1, 3, 16, 16)
        down = W.resize(x, (4, 4), antialias=True)
        assert down.shape == (1, 3, 4, 4)

    def test_resize_side(self, key):
        x = jax.random.uniform(key, (1, 3, 8, 16))
        out = W.resize(x, 4, side="short")
        assert out.shape == (1, 3, 4, 8)

    def test_resize_matches_torch_bilinear(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF
        x = np.random.default_rng(0).random((1, 2, 8, 8)).astype(np.float32)
        ours = W.resize(jnp.array(x), (13, 5))
        ref = TF.interpolate(torch.from_numpy(x), (13, 5), mode="bilinear",
                             align_corners=False).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


class TestHighLevel:
    def test_rotate_shape(self, key):
        x = jax.random.uniform(key, (2, 3, 8, 8))
        out = W.rotate(x, jnp.array([15.0, -30.0]))
        assert out.shape == x.shape

    def test_translate(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        out = W.translate(x, jnp.array([[2.0, 0.0]]))
        np.testing.assert_allclose(out[0, 0, :, 2:], x[0, 0, :, :-2], atol=1e-4)

    def test_scale(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        out = W.scale(x, jnp.array([2.0]))
        assert out.shape == x.shape

    def test_hflip(self, key):
        x = jax.random.uniform(key, (1, 1, 4, 4))
        np.testing.assert_allclose(W.hflip(W.hflip(x)), x)
        np.testing.assert_allclose(W.hflip(x)[0, 0, 0, 0], x[0, 0, 0, 3])


class TestElasticTps:
    def test_elastic_zero_noise(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        noise = jnp.zeros((1, 2, 8, 8))
        out = W.elastic_transform2d(x, noise, (7, 7), (2.0, 2.0),
                                    align_corners=True)
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_tps_identity(self, key):
        pts = jax.random.uniform(key, (1, 5, 2)) * 2 - 1
        kw, aw = W.get_tps_transform(pts, pts)
        out = W.warp_points_tps(pts, pts, kw, aw)
        np.testing.assert_allclose(out, pts, atol=1e-4)

    def test_tps_image(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        pts = jnp.array([[[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5],
                          [0.0, 0.0]]])
        kw, aw = W.get_tps_transform(pts, pts)
        out = W.warp_image_tps(x, pts, kw, aw, align_corners=True)
        np.testing.assert_allclose(out, x, atol=1e-3)
