import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.losses as L
import kornia_tpu.metrics as M
from kornia_tpu.contrib import (combine_tensor_patches, connected_components,
                                distance_transform, diamond_square,
                                extract_tensor_patches, histogram_matching,
                                kmeans)


class TestSsim:
    def test_identical(self, key):
        x = jax.random.uniform(key, (1, 1, 16, 16))
        s = L.ssim(x, x)
        np.testing.assert_allclose(s, 1.0, atol=1e-3)

    def test_loss_zero_for_identical(self, key):
        x = jax.random.uniform(key, (1, 1, 16, 16))
        assert float(L.ssim_loss(x, x)) < 1e-3

    def test_different_lower(self, key):
        k1, k2 = jax.random.split(key)
        x = jax.random.uniform(k1, (1, 1, 16, 16))
        y = jax.random.uniform(k2, (1, 1, 16, 16))
        assert float(jnp.mean(L.ssim(x, y))) < 0.9

    def test_grad(self, key):
        x = jax.random.uniform(key, (1, 1, 16, 16))
        g = jax.grad(lambda t: L.ssim_loss(t, x * 0.5))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_ms_ssim(self, key):
        x = jax.random.uniform(key, (1, 1, 64, 64))
        assert float(L.ms_ssim_loss(x, x)) < 1e-3

    def test_ssim3d(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 16, 16))
        np.testing.assert_allclose(L.ssim3d(x, x, 5), 1.0, atol=1e-3)


class TestLosses:
    def test_psnr(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        assert float(L.psnr(x, x)) > 100
        assert float(L.psnr(x, jnp.clip(x + 0.1, 0, 1))) < 30

    def test_tv(self):
        flat = jnp.ones((1, 1, 8, 8))
        assert float(L.total_variation(flat).sum()) == 0.0

    def test_focal(self, key):
        logits = jax.random.normal(key, (4, 3, 8, 8))
        target = jax.random.randint(key, (4, 8, 8), 0, 3)
        loss = L.focal_loss(logits, target, reduction="mean")
        assert float(loss) > 0
        g = jax.grad(lambda t: L.focal_loss(t, target, reduction="mean"))(logits)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_binary_focal(self, key):
        logits = jax.random.normal(key, (4, 1, 8, 8))
        target = (jax.random.uniform(key, (4, 1, 8, 8)) > 0.5).astype(jnp.float32)
        assert float(L.binary_focal_loss_with_logits(
            logits, target, reduction="mean")) > 0

    def test_dice_perfect(self):
        target = jnp.zeros((1, 4, 4), jnp.int32)
        logits = jnp.zeros((1, 2, 4, 4)).at[:, 0].set(100.0)
        assert float(L.dice_loss(logits, target)) < 1e-3

    def test_tversky(self, key):
        logits = jax.random.normal(key, (2, 3, 8, 8))
        target = jax.random.randint(key, (2, 8, 8), 0, 3)
        assert float(L.tversky_loss(logits, target)) > 0

    def test_lovasz_hinge(self, key):
        logits = jax.random.normal(key, (2, 1, 8, 8))
        target = (jax.random.uniform(key, (2, 8, 8)) > 0.5).astype(jnp.float32)
        assert np.isfinite(float(L.lovasz_hinge_loss(logits, target)))

    def test_kl_js(self, key):
        p = jax.nn.softmax(jax.random.normal(key, (1, 1, 4, 4)).reshape(1, 1, -1)
                           ).reshape(1, 1, 4, 4)
        assert float(L.kl_div_loss_2d(p, p)) < 1e-6
        assert float(L.js_div_loss_2d(p, p)) < 1e-6

    def test_robust_penalties(self, key):
        x = jax.random.uniform(key, (4, 4))
        y = x + 0.1
        for fn in [L.charbonnier_loss, L.cauchy_loss, L.geman_mcclure_loss,
                   L.welsch_loss]:
            v = fn(x, y, reduction="mean")
            assert 0 < float(v) < 1

    def test_irls_weights(self):
        r2 = jnp.array([0.0, 1.0, 100.0])
        for wfn in [L.huber_weight, L.cauchy_weight, L.geman_mcclure_weight,
                    L.welsch_weight, L.tukey_weight]:
            w = wfn(r2)
            assert float(w[0]) >= float(w[1]) >= float(w[2])

    def test_depth_smooth(self, key):
        idepth = jax.random.uniform(key, (1, 1, 8, 8))
        image = jax.random.uniform(key, (1, 3, 8, 8))
        assert float(L.inverse_depth_smoothness_loss(idepth, image)) > 0


class TestMetrics:
    def test_accuracy(self):
        logits = jnp.array([[0.0, 1.0], [1.0, 0.0]])
        target = jnp.array([1, 0])
        acc = M.accuracy(logits, target)[0]
        np.testing.assert_allclose(acc, 100.0)

    def test_confusion_and_iou(self):
        pred = jnp.array([[0, 1, 1, 0]])
        tgt = jnp.array([[0, 1, 0, 0]])
        cm = M.confusion_matrix(pred, tgt, 2)
        np.testing.assert_allclose(cm[0], [[2, 1], [0, 1]])
        iou = M.mean_iou(pred, tgt, 2)
        np.testing.assert_allclose(iou[0], [2 / 3, 1 / 2], atol=1e-4)

    def test_bbox_iou(self):
        b1 = jnp.array([[0.0, 0, 2, 2]])
        b2 = jnp.array([[1.0, 1, 3, 3], [0.0, 0, 2, 2]])
        iou = M.mean_iou_bbox(b1, b2)
        np.testing.assert_allclose(iou[0], [1 / 7, 1.0], atol=1e-4)

    def test_aepe(self, key):
        f = jax.random.normal(key, (4, 4, 2))
        assert float(M.aepe(f, f)) == 0.0

    def test_ate_alignment(self, key):
        # trajectory equal up to a rigid transform → ATE ~ 0 after alignment
        from kornia_tpu.geometry.liegroup import Se3
        traj = jax.random.normal(key, (20, 3))
        T = Se3.random(jax.random.fold_in(key, 1))
        traj2 = T.act(traj)
        assert float(M.ate_rmse(traj2, traj)) < 1e-4
        assert float(M.ate_rmse(traj2 + 0.5, traj, align=False)) > 0.1

    def test_rpe(self, key):
        from kornia_tpu.geometry.liegroup import Se3
        poses = Se3.exp(jax.random.normal(key, (10, 6)) * 0.1).matrix()
        t_err, r_err = M.rpe(poses, poses)
        assert float(t_err) < 1e-5
        assert float(r_err) < 1e-3


class TestContrib:
    def test_connected_components(self):
        img = jnp.zeros((1, 1, 8, 8)).at[0, 0, 1:3, 1:3].set(1.0).at[
            0, 0, 5:7, 5:7].set(1.0)
        labels = connected_components(img, 20)
        l1 = float(labels[0, 0, 1, 1])
        l2 = float(labels[0, 0, 5, 5])
        assert l1 != l2 and l1 > 0 and l2 > 0
        assert float(labels[0, 0, 0, 0]) == 0.0

    def test_distance_transform(self):
        img = jnp.zeros((1, 1, 9, 9)).at[0, 0, 4, 4].set(1.0)
        dt = distance_transform(img)
        assert float(dt[0, 0, 4, 4]) == 0.0
        assert float(dt[0, 0, 4, 6]) > float(dt[0, 0, 4, 5]) > 0

    def test_diamond_square(self, key):
        out = diamond_square((2, 1, 16, 16), key=key)
        assert out.shape == (2, 1, 16, 16)
        assert float(out.min()) >= -1e-5 and float(out.max()) <= 1 + 1e-5

    def test_patches_roundtrip(self, key):
        x = jax.random.uniform(key, (1, 2, 8, 8))
        p = extract_tensor_patches(x, 4, 4)
        assert p.shape == (1, 4, 2, 4, 4)
        back = combine_tensor_patches(p, 8, 4, 4)
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_patches_overlap(self, key):
        x = jax.random.uniform(key, (1, 1, 8, 8))
        p = extract_tensor_patches(x, 4, 2)
        back = combine_tensor_patches(p, 8, 4, 2)
        np.testing.assert_allclose(back, x, atol=1e-6)

    def test_histogram_matching(self, key):
        k1, k2 = jax.random.split(key)
        src = jax.random.uniform(k1, (1, 1, 16, 16))
        tmpl = jax.random.uniform(k2, (1, 1, 16, 16)) * 2.0 + 1.0
        out = histogram_matching(src, tmpl)
        assert abs(float(out.mean()) - float(tmpl.mean())) < 0.1

    def test_kmeans(self, key):
        k1, k2 = jax.random.split(key)
        c1 = jax.random.normal(k1, (50, 2)) + jnp.array([10.0, 0])
        c2 = jax.random.normal(k2, (50, 2)) + jnp.array([-10.0, 0])
        x = jnp.concatenate([c1, c2])
        centers, assign = kmeans(x, 2, key)
        xs = np.sort(np.asarray(centers[:, 0]))
        np.testing.assert_allclose(xs, [-10, 10], atol=1.0)
        # each cluster internally consistent
        assert len(np.unique(np.asarray(assign[:50]))) == 1
