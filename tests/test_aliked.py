"""ALIKED + deform_conv2d: parity vs reference and TPU-native contracts."""

import sys
import types

import numpy as np
import pytest

sys.path.append("/root/reference")  # append: /root/reference/tests must not shadow our tests/ package
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from kornia_tpu.feature.aliked import ALIKED, _eigh2x2, dkd_detect
from kornia_tpu.ops.deform_conv import deform_conv2d

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(7)


@pytest.mark.parametrize(
    "cfg",
    [
        # B, C, H, W, Co, kh, kw, s, p, d, groups, G, mask, bias
        (2, 4, 9, 11, 6, 3, 3, 1, 1, 1, 1, 1, False, True),
        (1, 6, 8, 8, 4, 3, 3, 2, 1, 1, 2, 1, True, False),
        (2, 4, 10, 7, 8, 2, 3, 1, 0, 2, 1, 2, True, True),
        (1, 3, 6, 6, 5, 1, 1, 1, 0, 1, 1, 1, False, False),
    ],
)
def test_deform_conv2d_parity(cfg):
    from kornia.feature.aliked.deform_conv2d import deform_conv2d as ref_dc

    B, C, H, W, Co, kh, kw, s, p, d, groups, G, use_mask, use_bias = cfg
    K = kh * kw
    Ho = (H + 2 * p - d * (kh - 1) - 1) // s + 1
    Wo = (W + 2 * p - d * (kw - 1) - 1) // s + 1
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    off = (rng.standard_normal((B, 2 * G * K, Ho, Wo)) * 2).astype(np.float32)
    w = rng.standard_normal((Co, C // groups, kh, kw)).astype(np.float32)
    b = rng.standard_normal((Co,)).astype(np.float32) if use_bias else None
    m = rng.random((B, G * K, Ho, Wo)).astype(np.float32) if use_mask else None
    ref = ref_dc(
        torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(w),
        None if b is None else torch.from_numpy(b), (s, s), (p, p), (d, d),
        None if m is None else torch.from_numpy(m),
    ).numpy()
    ours = np.asarray(deform_conv2d(x, off, w, b, (s, s), (p, p), (d, d), m))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_dkd_parity_threshold_mode():
    """Fixed-K dkd_detect's valid subset == reference DKD's detections."""
    from kornia.feature.aliked.aliked import DKD

    smap = rng.random((1, 1, 32, 40)).astype(np.float32) ** 4  # sparse peaks
    ref_kps, ref_sc, _ = DKD(radius=2, scores_th=0.2)(torch.from_numpy(smap))
    kps, sc, _disp, valid = dkd_detect(jnp.asarray(smap[:, 0]), 64,
                                       radius=2, scores_th=0.2)
    n = int(np.asarray(valid[0]).sum())
    assert n == ref_kps[0].shape[0]
    ours = np.asarray(kps[0][:n])
    refs = ref_kps[0].numpy()
    order_o = np.lexsort((ours[:, 0], ours[:, 1]))
    order_r = np.lexsort((refs[:, 0], refs[:, 1]))
    np.testing.assert_allclose(ours[order_o], refs[order_r], atol=1e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(sc[0][:n])), np.sort(ref_sc[0].numpy()), atol=1e-4
    )


def test_eigh2x2_reconstructs_covariance():
    b = rng.standard_normal((64, 2, 2)).astype(np.float32)
    cov = np.einsum("nij,nkj->nik", b, b)  # SPD
    evals, evecs = _eigh2x2(jnp.asarray(cov))
    evals, evecs = np.asarray(evals), np.asarray(evecs)
    ref_vals = np.linalg.eigvalsh(cov)
    np.testing.assert_allclose(evals, ref_vals, atol=1e-3, rtol=1e-3)
    rec = np.einsum("nij,nj,nkj->nik", evecs, evals, evecs)
    np.testing.assert_allclose(rec, cov, atol=1e-3, rtol=1e-3)
    # A = U sqrt(diag): A A^T == cov
    A = evecs * np.sqrt(np.clip(evals, 0, None))[:, None, :]
    np.testing.assert_allclose(A @ A.transpose(0, 2, 1), cov, atol=1e-3,
                               rtol=1e-3)


def test_aliked_shapes_jit_grad():
    m = ALIKED("aliked-t16", num_keypoints=64)
    img = jnp.asarray(rng.random((2, 3, 64, 64)), dtype=jnp.float32)
    kps, sc, desc, valid = m(img)
    assert kps.shape == (2, 64, 2) and desc.shape == (2, 64, 64)
    assert bool(jnp.isfinite(kps).all() and jnp.isfinite(desc).all())
    assert bool((kps >= 0).all()) and bool((kps[..., 0] <= 63).all())
    # descriptors are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(desc), axis=-1), 1.0, atol=1e-3
    )
    lafs, resp, d2 = m.forward_laf(img)
    assert lafs.shape == (2, 64, 2, 3) and resp.shape == (2, 64, 1)

    fn = jax.jit(lambda x: m.model.apply(m.params, x, 64, 0.2, 2),
                 static_argnums=())
    out = fn(jnp.transpose(img, (0, 2, 3, 1)))
    assert out[2].dtype == jnp.bool_

    g = jax.grad(
        lambda x: m.model.apply(
            m.params, jnp.transpose(x, (0, 2, 3, 1)), 64, 0.2, 2)[1].sum()
    )(img)
    assert bool(jnp.isfinite(g).all())


def test_aliked_grayscale_broadcast():
    m = ALIKED("aliked-t16", num_keypoints=32)
    img = jnp.asarray(rng.random((1, 1, 32, 32)), dtype=jnp.float32)
    kps, sc, desc, valid = m(img)
    assert kps.shape == (1, 32, 2)
