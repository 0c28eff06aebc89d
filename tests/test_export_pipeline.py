"""Deployment: StableHLO export of whole pipelines (the ONNX-Sequential
analogue — reference: kornia/onnx/sequential.py combines exported graphs;
here whole pipelines export as ONE artifact)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestPipelineExport:
    def test_export_aug_pipeline(self, key):
        import kornia_tpu.augmentation as A
        from kornia_tpu.utils.export import load_exported, save_exported
        seq = A.ImageSequential(A.ColorJiggle(p=1.0),
                                A.RandomHorizontalFlip(p=1.0))
        img = jax.random.uniform(key, (2, 3, 16, 16))

        def pipeline(x, k):
            return seq(x, k)

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "aug.stablehlo")
            save_exported(path, pipeline, [img, key])
            op = load_exported(path)
            np.testing.assert_allclose(np.asarray(op(img, key)),
                                       np.asarray(pipeline(img, key)),
                                       atol=1e-4)

    def test_export_matcher(self, key):
        from kornia_tpu.feature.matching import match_smnn
        from kornia_tpu.utils.export import load_exported, save_exported
        d1 = jax.random.normal(key, (32, 64))
        d2 = jax.random.normal(jax.random.fold_in(key, 1), (32, 64))

        def matcher(a, b):
            dists, idx, valid = match_smnn(a, b, 0.95)
            return dists, idx, valid

        with tempfile.TemporaryDirectory() as dd:
            path = os.path.join(dd, "match.stablehlo")
            save_exported(path, matcher, [d1, d2])
            op = load_exported(path)
            ref = matcher(d1, d2)
            out = op(d1, d2)
            np.testing.assert_array_equal(np.asarray(out[1]),
                                          np.asarray(ref[1]))

    def test_export_model(self, key):
        from kornia_tpu.models.efficient_vit import (EfficientViT,
                                                     EfficientViTConfig)
        from kornia_tpu.utils.export import load_exported, save_exported
        m = EfficientViT(EfficientViTConfig((4, 8, 8, 16, 16),
                                            (1, 1, 1, 1, 1), dim=8))
        x = jax.random.uniform(key, (1, 3, 32, 32))
        m.params  # init params

        def fwd(inp):
            return m(inp)["stage_final"]

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "model.stablehlo")
            save_exported(path, fwd, [x])
            op = load_exported(path)
            np.testing.assert_allclose(np.asarray(op(x)),
                                       np.asarray(fwd(x)), atol=1e-5)


class TestBackbones:
    def test_shapes(self, key):
        from kornia_tpu.models.efficient_vit import (EfficientViT,
                                                     EfficientViTConfig)
        from kornia_tpu.models.tiny_vit import TinyViT, TinyViTConfig
        x = jax.random.uniform(key, (1, 3, 64, 64))
        out = EfficientViT(EfficientViTConfig((4, 8, 8, 16, 16),
                                              (1, 1, 1, 1, 1), dim=8))(x)
        assert out["stage_final"].shape == (1, 16, 2, 2)
        assert out["stage0"].shape == (1, 4, 32, 32)
        tv = TinyViT(TinyViTConfig(img_size=64, embed_dims=(8, 16, 16, 32),
                                   depths=(1, 1, 1, 1), num_heads=(2, 4, 4, 8),
                                   window_sizes=(3, 3, 3, 3), num_classes=10))
        assert tv(x).shape == (1, 10)
