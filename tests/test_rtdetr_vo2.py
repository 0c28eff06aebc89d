import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestRTDETR:
    def test_shapes(self, key):
        from kornia_tpu.models.rt_detr import RTDETR, RTDETRConfig
        cfg = RTDETRConfig(num_classes=5, input_size=96,
                           resnet_n_blocks=[1, 1, 1, 1],
                           neck_hidden_dim=32, neck_dim_feedforward=64,
                           neck_expansion=0.5, head_hidden_dim=32,
                           head_num_queries=16, head_num_decoder_layers=1,
                           head_num_heads=4)
        m = RTDETR(cfg, key=key)
        logits, boxes = m(jax.random.uniform(key, (2, 3, 96, 96)))
        assert logits.shape == (2, 16, 5)
        assert boxes.shape == (2, 16, 4)
        dets = m.detect(jax.random.uniform(key, (2, 3, 96, 96)))
        assert dets.shape == (2, 16, 6)  # min(num_top_queries, Q*K)
        assert bool(jnp.all(dets[..., 1] >= 0))


class TestHomographyDecomposition:
    def test_recovers_planar_motion(self, key):
        from kornia_tpu.geometry.conversions import axis_angle_to_rotation_matrix
        from kornia_tpu.geometry.epipolar import (
            decompose_homography_matrix, motion_from_homography_choose_solution)
        R_true = axis_angle_to_rotation_matrix(
            jnp.array([[0.05, -0.1, 0.02]]))[0]
        t_true = jnp.array([0.3, 0.1, -0.05])
        n = jnp.array([0.0, 0, 1.0])
        d = 2.0
        H = R_true + jnp.outer(t_true, n) / d
        pts = jax.random.uniform(key, (30, 2)) * 0.6 - 0.3
        X = jnp.concatenate([pts * d, jnp.full((30, 1), d)], -1)
        x1 = X[:, :2] / X[:, 2:]
        X2 = X @ R_true.T + t_true
        x2 = X2[:, :2] / X2[:, 2:]
        Rb, tb, nb = motion_from_homography_choose_solution(
            H[None], x1[None], x2[None])
        np.testing.assert_allclose(Rb[0], R_true, atol=1e-4)
        t_dir = t_true / jnp.linalg.norm(t_true)
        tb_dir = tb[0, :, 0] / jnp.linalg.norm(tb[0, :, 0])
        np.testing.assert_allclose(tb_dir, t_dir, atol=1e-3)
        np.testing.assert_allclose(nb[0, :, 0], n, atol=1e-3)
