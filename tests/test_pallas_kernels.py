"""Pallas kernel unit tests (interpret mode — exact semantics vs the
XLA formulations they replace)."""

import jax
import jax.numpy as jnp
import numpy as np



class TestPatchSampleMXU:
    def test_matches_flat_bilinear(self):
        from kornia_tpu.ops.pallas_kernels import patch_sample_mxu

        rng = np.random.default_rng(0)
        H, W = 300, 400
        atlas = jnp.asarray(rng.random((H, W)), jnp.float32)
        N, S = 7, 41 * 41
        centers = jnp.asarray(rng.uniform([70, 70], [W - 70, H - 70],
                                          (N, 2)), jnp.float32)
        off = rng.uniform(-55, 55, (N, S, 2)).astype(np.float32)
        px = jnp.asarray(np.asarray(centers)[:, None, 0] + off[..., 0])
        py = jnp.asarray(np.asarray(centers)[:, None, 1] + off[..., 1])
        out = patch_sample_mxu(atlas, px, py, centers, interpret=True)

        a = np.asarray(atlas)
        x = np.asarray(px)
        y = np.asarray(py)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        tx = x - x0
        ty = y - y0
        ref = (a[y0, x0] * (1 - tx) * (1 - ty)
               + a[y0, x0 + 1] * tx * (1 - ty)
               + a[y0 + 1, x0] * (1 - tx) * ty
               + a[y0 + 1, x0 + 1] * tx * ty)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_odd_counts_padded(self):
        from kornia_tpu.ops.pallas_kernels import patch_sample_mxu

        rng = np.random.default_rng(1)
        atlas = jnp.asarray(rng.random((200, 300)), jnp.float32)
        N, S = 3, 19 * 19  # N not a multiple of the keypoint block
        centers = jnp.asarray(rng.uniform([80, 80], [220, 120], (N, 2)),
                              jnp.float32)
        off = rng.uniform(-20, 20, (N, S, 2)).astype(np.float32)
        px = jnp.asarray(np.asarray(centers)[:, None, 0] + off[..., 0])
        py = jnp.asarray(np.asarray(centers)[:, None, 1] + off[..., 1])
        out = patch_sample_mxu(atlas, px, py, centers, interpret=True)
        assert out.shape == (N, S)
        assert bool(jnp.all(jnp.isfinite(out)))
