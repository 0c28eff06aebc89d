import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestWarp3d:
    def test_identity(self, key):
        from kornia_tpu.ops.warp3d import warp_affine3d
        v = jax.random.uniform(key, (2, 1, 8, 8, 8))
        M = jnp.concatenate([jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                             jnp.zeros((2, 3, 1))], -1)
        out = warp_affine3d(v, M, (8, 8, 8))
        np.testing.assert_allclose(out, v, atol=1e-5)

    def test_translate(self, key):
        from kornia_tpu.ops.warp3d import warp_affine3d
        v = jax.random.uniform(key, (1, 1, 8, 8, 8))
        M = jnp.concatenate([jnp.eye(3)[None], jnp.zeros((1, 3, 1))], -1)
        M = M.at[:, 0, 3].set(2.0)
        out = warp_affine3d(v, M, (8, 8, 8))
        np.testing.assert_allclose(out[..., 2:], v[..., :-2], atol=1e-5)

    def test_center_crop3d(self, key):
        from kornia_tpu.ops.warp3d import center_crop3d
        v = jax.random.uniform(key, (1, 2, 8, 8, 8))
        out = center_crop3d(v, (4, 4, 4))
        np.testing.assert_allclose(out, v[:, :, 2:6, 2:6, 2:6])

    def test_grid_sample3d_nearest(self, key):
        from kornia_tpu.ops.warp3d import grid_sample3d
        from kornia_tpu.core.grid import create_meshgrid3d
        v = jax.random.uniform(key, (1, 1, 4, 4, 4))
        grid = create_meshgrid3d(4, 4, 4, True)
        out = grid_sample3d(v, grid, "nearest")
        np.testing.assert_allclose(out, v, atol=1e-6)


class TestJpeg:
    def test_quality_ordering(self, key):
        from kornia_tpu.ops.jpeg import jpeg_codec_differentiable
        from kornia_tpu.ops.filters import gaussian_blur2d
        img = gaussian_blur2d(jax.random.uniform(key, (1, 3, 32, 32)), 5, 1.5)
        e95 = float(jnp.abs(jpeg_codec_differentiable(
            img, jnp.array([95.0])) - img).mean())
        e10 = float(jnp.abs(jpeg_codec_differentiable(
            img, jnp.array([10.0])) - img).mean())
        assert e95 < e10

    def test_grad(self, key):
        from kornia_tpu.ops.jpeg import jpeg_codec_differentiable
        img = jax.random.uniform(key, (1, 3, 16, 16))
        g = jax.grad(lambda t: jpeg_codec_differentiable(
            t, jnp.array([50.0])).sum())(img)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0


class TestAutoAug:
    @pytest.mark.parametrize("policy", ["rand", "trivial", "auto"])
    def test_smoke(self, key, policy):
        from kornia_tpu.augmentation.auto import (AutoAugment, RandAugment,
                                                  TrivialAugment)
        p = {"rand": RandAugment(2, 10), "trivial": TrivialAugment(),
             "auto": AutoAugment()}[policy]
        x = jax.random.uniform(key, (4, 3, 16, 16))
        out = p(x, key)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_jit(self, key):
        from kornia_tpu.augmentation.auto import TrivialAugment
        p = TrivialAugment()
        x = jax.random.uniform(key, (2, 3, 16, 16))
        out = jax.jit(lambda a, k: p(a, k))(x, key)
        np.testing.assert_allclose(out, p(x, key), atol=1e-5)


class TestLearnedModels:
    def test_loftr_shapes(self, key):
        from kornia_tpu.feature.loftr import LoFTR, LoFTRConfig
        img = jax.random.uniform(key, (1, 1, 64, 64))
        m = LoFTR(LoFTRConfig(coarse_dim=64, fine_dim=32,
                              num_coarse_layers=1, num_heads=4, top_k=32))
        out = m({"image0": img, "image1": img})
        assert out["keypoints0"].shape == (1, 32, 2)
        assert out["confidence"].shape == (1, 32)
        assert bool(jnp.all(jnp.isfinite(out["keypoints0"])))

    def test_lightglue_shapes(self, key):
        from kornia_tpu.feature.lightglue import LightGlue, LightGlueConfig
        kp = jax.random.uniform(key, (1, 16, 2)) * 64
        d = jax.random.normal(key, (1, 16, 64))
        lg = LightGlue(LightGlueConfig(dim=64, num_heads=4, num_layers=2))
        out = lg({"keypoints0": kp, "keypoints1": kp, "descriptors0": d,
                  "descriptors1": d, "image_size": (64.0, 64.0)})
        assert out["matches0"].shape == (1, 16)
        assert out["valid"].dtype == bool

    def test_disk(self, key):
        from kornia_tpu.feature.disk import DISK
        disk = DISK()
        feats = disk(jax.random.uniform(key, (1, 3, 32, 32)), n=16)
        assert feats.keypoints.shape == (1, 16, 2)
        assert feats.descriptors.shape == (1, 16, 128)
        # valid descriptors normalized
        n = jnp.linalg.norm(feats.descriptors, axis=-1)
        np.testing.assert_allclose(np.asarray(n)[np.asarray(feats.valid)],
                                   1.0, atol=1e-3)

    def test_vit(self, key):
        from kornia_tpu.models.vit import ViTConfig, VisionTransformer
        vit = VisionTransformer(ViTConfig(image_size=32, patch_size=8, dim=32,
                                          depth=1, num_heads=2, num_classes=5))
        out = vit(jax.random.uniform(key, (2, 3, 32, 32)))
        assert out.shape == (2, 5)

    def test_vit_features(self, key):
        from kornia_tpu.models.vit import ViTConfig, VisionTransformer
        vit = VisionTransformer(ViTConfig(image_size=32, patch_size=8, dim=32,
                                          depth=1, num_heads=2, num_classes=0))
        out = vit(jax.random.uniform(key, (1, 3, 32, 32)))
        assert out.shape == (1, 17, 32)  # 16 patches + cls


class TestStitchTrack:
    @pytest.mark.slow
    def test_stitcher(self, key):
        from kornia_tpu.contrib.image_stitching import ImageStitcher
        from kornia_tpu.ops.filters import gaussian_blur2d
        from kornia_tpu.ops.warp import warp_perspective
        base = gaussian_blur2d(jax.random.uniform(key, (1, 1, 96, 96)), 3, 1.0)
        M = jnp.eye(3).at[0, 2].set(30.0)[None]  # right image shifted
        right = warp_perspective(base, M, (96, 96))
        stitcher = ImageStitcher(num_features=256)
        pano = stitcher(base, right)
        assert pano.shape == (1, 1, 96, 192)

    @pytest.mark.slow
    def test_tracker(self, key):
        from kornia_tpu.tracking import HomographyTracker
        from kornia_tpu.ops.filters import gaussian_blur2d
        from kornia_tpu.ops.warp import warp_perspective
        target = gaussian_blur2d(jax.random.uniform(key, (1, 1, 96, 96)), 3, 1.0)
        tracker = HomographyTracker(num_features=256)
        tracker.set_target(target)
        M_true = jnp.eye(3).at[0, 2].set(5.0)[None]
        frame = warp_perspective(target, M_true, (96, 96))
        H, ok = tracker(frame)
        assert bool(ok)
        np.testing.assert_allclose(H[0] / H[0, 2, 2], M_true[0], atol=0.5)


class TestExportCheckpoint:
    def test_export_roundtrip(self, key):
        from kornia_tpu.utils.export import load_exported, save_exported
        from kornia_tpu.ops.filters import gaussian_blur2d
        x = jax.random.uniform(key, (1, 1, 16, 16))
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "op.stablehlo")
            save_exported(path, lambda t: gaussian_blur2d(t, 3, 1.0), [x])
            op = load_exported(path)
            np.testing.assert_allclose(op(x), gaussian_blur2d(x, 3, 1.0),
                                       atol=1e-6)

    def test_checkpoint_roundtrip(self, key):
        from kornia_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
        state = {"w": jax.random.normal(key, (4, 4)),
                 "step": jnp.asarray(3)}
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "ckpt")
            save_checkpoint(path, state)
            back = load_checkpoint(path, state)
            np.testing.assert_allclose(back["w"], state["w"])
            assert int(back["step"]) == 3
