"""Pallas kernels run in interpret mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.feature.matching import distance_matrix, match_smnn
from kornia_tpu.ops.pallas_kernels import match_smnn_pallas, streaming_min2


class TestStreamingMin2:
    def test_matches_full_matrix(self, key):
        d1 = jax.random.normal(key, (512, 128))
        d2 = jax.random.normal(jax.random.fold_in(key, 1), (512, 128))
        m1, m2, idx = streaming_min2(d1, d2, interpret=True)
        dm = distance_matrix(d1, d2)
        top2 = -jax.lax.top_k(-dm, 2)[0]
        np.testing.assert_allclose(m1, jnp.min(dm, 1), atol=1e-3)
        np.testing.assert_allclose(m2, top2[:, 1], atol=1e-3)
        np.testing.assert_array_equal(idx, jnp.argmin(dm, 1))

    def test_rectangular(self, key):
        d1 = jax.random.normal(key, (256, 64))
        d2 = jax.random.normal(jax.random.fold_in(key, 1), (512, 64))
        m1, _, idx = streaming_min2(d1, d2, interpret=True)
        dm = distance_matrix(d1, d2)
        np.testing.assert_allclose(m1, jnp.min(dm, 1), atol=1e-3)
        np.testing.assert_array_equal(idx, jnp.argmin(dm, 1))

    def test_smnn_agrees_with_xla(self, key):
        d1 = jax.random.normal(key, (256, 64))
        d2 = jax.random.normal(jax.random.fold_in(key, 2), (256, 64))
        rd, mt, v = match_smnn_pallas(d1, d2, 0.95, interpret=True)
        rd2, mt2, v2 = match_smnn(d1, d2, 0.95)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(mt[v][:, 1]),
                                      np.asarray(mt2[v2][:, 1]))


class TestFusedSeparableBlur:
    def test_matches_filter2d_separable(self):
        from kornia_tpu.ops.filters import (filter2d_separable,
                                            get_gaussian_kernel1d)
        from kornia_tpu.ops.pallas_kernels import fused_separable_blur2d
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 3, 32, 40)), dtype=jnp.float32)
        for ksz, s in [(3, 0.8), (5, 1.5), (9, 2.0)]:
            k = get_gaussian_kernel1d(ksz, s)
            ref = filter2d_separable(x, k, k, "reflect")
            ours = fused_separable_blur2d(x, k, k, "reflect", interpret=True)
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       atol=1e-5)

    def test_replicate_border_and_asym_kernels(self):
        from kornia_tpu.ops.filters import (filter2d_separable,
                                            get_gaussian_kernel1d)
        from kornia_tpu.ops.pallas_kernels import fused_separable_blur2d
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((1, 1, 24, 48)), dtype=jnp.float32)
        ky = get_gaussian_kernel1d(7, 1.2)
        kx = get_gaussian_kernel1d(3, 0.9)
        ref = filter2d_separable(x, kx, ky, "replicate")
        ours = fused_separable_blur2d(x, ky, kx, "replicate",
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)

    def test_block_divisibility(self):
        # B*C = 12 is divisible by 4 and 2 but not 8 — exercises NB select
        from kornia_tpu.ops.filters import (filter2d_separable,
                                            get_gaussian_kernel1d)
        from kornia_tpu.ops.pallas_kernels import fused_separable_blur2d
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((4, 3, 16, 16)), dtype=jnp.float32)
        k = get_gaussian_kernel1d(5, 1.0)
        ref = filter2d_separable(x, k, k, "reflect")
        ours = fused_separable_blur2d(x, k, k, "reflect", interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5)


class TestFusedBlurGrad:
    def test_custom_vjp_matches_xla_reference(self):
        """Custom VJP (adjoint = same kernel with transposed band
        operators): grads wrt image AND kernels match filter2d_separable."""
        from kornia_tpu.ops.filters import (filter2d_separable,
                                            get_gaussian_kernel1d)
        from kornia_tpu.ops.pallas_kernels import fused_separable_blur2d
        k = get_gaussian_kernel1d(5, 1.0)
        x = jnp.asarray(np.random.default_rng(3).random((2, 3, 16, 16)),
                        dtype=jnp.float32)

        def loss(x, k):
            return (fused_separable_blur2d(
                x, k, k, "reflect", interpret=True) ** 2).sum()

        def loss_ref(x, k):
            return (filter2d_separable(x, k, k, "reflect") ** 2).sum()

        gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
        gxr, gkr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk).reshape(-1),
                                   np.asarray(gkr).reshape(-1), atol=1e-3)
