"""Fuzz sweeps for the 3D (volumetric) warp stack, video containers and
the Pallas streaming matcher: random shapes + algebraic invariants
(VERDICT r3 item 4 — the reference's cardinality parametrization covers
3D ops and containers too; TESTING.md:41-57).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.ops import warp3d

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

_VOLS = [(1, 1, 5, 9, 11), (2, 2, 8, 12, 6), (1, 3, 4, 16, 16)]


def _vol(shape, key=0):
    return jax.random.uniform(jax.random.PRNGKey(key), shape)


@pytest.mark.parametrize("shape", _VOLS)
def test_warp_affine3d_identity_fuzz(shape):
    x = _vol(shape)
    b = shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[None, :3], (b, 3, 4))
    out = warp3d.warp_affine3d(x, eye, shape[-3:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("shape", _VOLS)
def test_warp_perspective3d_identity_fuzz(shape):
    x = _vol(shape, key=1)
    b = shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[None], (b, 4, 4))
    out = warp3d.warp_perspective3d(x, eye, shape[-3:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


@pytest.mark.parametrize("shape", _VOLS)
def test_rotate3d_360_identity_fuzz(shape):
    """A full 360-degree yaw rotation returns the volume (interior)."""
    x = _vol(shape, key=2)
    b = shape[0]
    zeros = jnp.zeros((b,))
    out = warp3d.rotate3d(x, zeros, zeros, jnp.full((b,), 360.0))
    d, h, w = shape[-3:]
    if min(d, h, w) > 4:
        np.testing.assert_allclose(
            np.asarray(out[..., 1:-1, 1:-1, 1:-1]),
            np.asarray(x[..., 1:-1, 1:-1, 1:-1]), atol=1e-3)
    assert out.shape == x.shape


@pytest.mark.parametrize("shape", _VOLS)
def test_crop3d_shape_fuzz(shape):
    x = _vol(shape, key=3)
    b, c, d, h, w = shape
    td, th, tw = max(d - 2, 1), max(h - 3, 1), max(w - 1, 1)
    out = warp3d.center_crop3d(x, (td, th, tw))
    assert out.shape == (b, c, td, th, tw)
    assert bool(jnp.isfinite(out).all())


def test_get_affine_matrix3d_composition():
    """Translation-only and rotation-only matrices compose as expected."""
    b = 2
    trans = jnp.asarray([[1.0, 2.0, 3.0], [0.5, -1.0, 0.0]])
    center = jnp.zeros((b, 3))
    zeros = jnp.zeros((b,))
    ones = jnp.ones((b, 3))
    M = warp3d.get_affine_matrix3d(trans, center, ones, zeros, zeros, zeros)
    np.testing.assert_allclose(np.asarray(M[:, :3, :3]),
                               np.broadcast_to(np.eye(3), (b, 3, 3)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(M[:, :3, 3]), np.asarray(trans),
                               atol=1e-6)


@pytest.mark.parametrize("shape", _VOLS)
def test_equalize3d_range_fuzz(shape):
    from kornia_tpu.ops import equalize3d
    x = _vol(shape, key=4)
    out = equalize3d(x)
    assert out.shape == x.shape
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5


# ---------------------------------------------------------------------------
# VideoSequential: clip consistency + inverse at random clip shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("btchw", [(1, 3, 3, 16, 20), (2, 5, 1, 12, 12)])
def test_video_sequential_frame_consistency_fuzz(btchw):
    import kornia_tpu.augmentation as A
    b, t, c, h, w = btchw
    vs = A.VideoSequential(A.RandomAffine(degrees=20.0, p=1.0),
                           data_format="BTCHW", same_on_frame=True)
    # a STATIC clip: every frame identical => all warped frames identical
    frame = jax.random.uniform(jax.random.PRNGKey(0), (b, 1, c, h, w))
    clip = jnp.broadcast_to(frame, (b, t, c, h, w))
    out = vs(clip, key=jax.random.PRNGKey(1))
    assert out.shape == clip.shape
    for i in range(1, t):
        np.testing.assert_allclose(np.asarray(out[:, i]),
                                   np.asarray(out[:, 0]), atol=1e-5)


@pytest.mark.parametrize("t", [2, 4])
def test_video_sequential_inverse_fuzz(t):
    import kornia_tpu.augmentation as A
    vs = A.VideoSequential(A.RandomHorizontalFlip(p=1.0),
                           data_format="BTCHW")
    clip = jax.random.uniform(jax.random.PRNGKey(2), (2, t, 3, 10, 14))
    out = vs(clip, key=jax.random.PRNGKey(3))
    back = vs.inverse(out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(clip),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Streaming matcher vs XLA at random N/M/D (incl. non-multiples of tiles)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nmd", [(60, 100, 32), (128, 128, 64),
                                 (33, 257, 128)])
def test_streaming_min2_matches_xla_fuzz(nmd):
    from kornia_tpu.ops.pallas_kernels import streaming_min2
    n, m, d = nmd
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    d1 = jax.random.normal(k1, (n, d))
    d2 = jax.random.normal(k2, (m, d))
    m1, m2, idx = streaming_min2(d1, d2, interpret=True)
    # streaming_min2 reports SQUARED euclidean distances
    dm = jnp.maximum(
        jnp.sum(d1**2, 1)[:, None] + jnp.sum(d2**2, 1)[None]
        - 2 * d1 @ d2.T, 0.0)
    order = jnp.sort(dm, axis=1)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(order[:, 0]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(order[:, 1]),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.asarray(jnp.argmin(dm, 1)))


# ---------------------------------------------------------------------------
# JPEG codec: quality monotonicity + roundtrip bounds at random shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw", [(16, 16), (32, 48)])
def test_jpeg_quality_monotone_fuzz(hw):
    from kornia_tpu.ops.jpeg import jpeg_codec_differentiable
    h, w = hw
    # SMOOTH image: white noise is all high frequency and JPEG removes it
    # at every quality (mean err ~0.18 even at q=95, matching torch)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, h), jnp.linspace(0, 1, w),
                          indexing="ij")
    x = jnp.stack([0.5 + 0.4 * jnp.sin(3 * xx + yy),
                   0.5 + 0.3 * yy * xx,
                   0.5 + 0.2 * jnp.cos(2 * yy)])[None]
    errs = []
    for q in (10.0, 50.0, 95.0):
        y = jpeg_codec_differentiable(x, jnp.asarray([q]))
        errs.append(float(jnp.abs(y - x).mean()))
    assert errs[0] > errs[1] > errs[2], errs
    # high quality stays close on smooth content
    assert errs[2] < 0.01, errs


def test_jpeg_differentiable_grad():
    from kornia_tpu.ops.jpeg import jpeg_codec_differentiable
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 3, 16, 16))

    def loss(im):
        return jnp.sum(jpeg_codec_differentiable(
            im, jnp.asarray([50.0])) ** 2)

    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
