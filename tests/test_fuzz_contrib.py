"""Contrib + mix-augmentation property fuzz (VERDICT r3 item 4): the
contrib subsystem had smoke coverage only; these legs assert the actual
contracts (patch inversion, CC labeling invariants, distance-transform
metric properties, k-means convergence, mix-op label algebra).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kornia_tpu.contrib as C

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow


# ---------------------------------------------------------------------------
# extract/combine patches roundtrip at awkward shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("hw,win,stride", [
    ((16, 16), 8, 8), ((24, 32), 8, 8), ((20, 20), 10, 10)])
def test_patch_roundtrip_fuzz(hw, win, stride):
    h, w = hw
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, h, w))
    p = C.extract_tensor_patches(x, win, stride)
    assert p.shape[0] == 2 and p.shape[2] == 3
    back = C.combine_tensor_patches(p, (h, w), win, stride)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_extract_patches_overlap_counts():
    """Overlapping windows: each patch is an exact crop."""
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 12, 12))
    p = C.extract_tensor_patches(x, 6, 3)
    # first patch == top-left crop; last == bottom-right crop
    np.testing.assert_allclose(np.asarray(p[0, 0, 0]),
                               np.asarray(x[0, 0, :6, :6]), atol=0)
    np.testing.assert_allclose(np.asarray(p[0, -1, 0]),
                               np.asarray(x[0, 0, 6:, 6:]), atol=0)


# ---------------------------------------------------------------------------
# connected components: labels are consistent within blobs, distinct across
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_connected_components_fuzz(seed):
    rng = np.random.default_rng(seed)
    img = np.zeros((1, 1, 24, 24), np.float32)
    # three disjoint rectangles
    rects = [(2, 2, 6, 6), (10, 4, 15, 9), (18, 14, 22, 22)]
    for (y0, x0, y1, x1) in rects:
        img[0, 0, y0:y1, x0:x1] = 1.0
    labels = np.asarray(C.connected_components(jnp.asarray(img),
                                               num_iterations=64))
    ids = []
    for (y0, x0, y1, x1) in rects:
        blob = labels[0, 0, y0:y1, x0:x1]
        assert blob.min() == blob.max(), "blob got split"
        assert blob.min() > 0
        ids.append(blob.min())
    assert len(set(ids)) == 3, "blobs got merged"
    assert (labels[0, 0][img[0, 0] == 0] == 0).all()


# ---------------------------------------------------------------------------
# distance transform: metric properties
# ---------------------------------------------------------------------------


def test_distance_transform_fuzz():
    img = jnp.zeros((1, 1, 17, 23)).at[0, 0, 8, 11].set(1.0)
    dt = C.distance_transform(img)
    d = np.asarray(dt[0, 0])
    assert d[8, 11] == 0.0
    # distance grows with |offset| (l2-ish kernel): check a few points
    assert d[8, 12] <= d[8, 13] <= d[8, 14]
    assert abs(d[8, 13] - 2.0) < 0.4
    assert d.max() > 5.0


# ---------------------------------------------------------------------------
# k-means: recovers well-separated clusters
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_kmeans_separated_clusters_fuzz(seed):
    key = jax.random.PRNGKey(seed)
    centers = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    pts = jnp.concatenate([
        centers[i] + 0.3 * jax.random.normal(jax.random.fold_in(key, i),
                                             (40, 2))
        for i in range(3)], 0)
    km = C.KMeans(num_clusters=3, tolerance=1e-5, max_iterations=50,
                  seed=seed)
    km.fit(pts)
    got = np.sort(np.asarray(km.cluster_centers), axis=0)
    want = np.sort(np.asarray(centers), axis=0)
    np.testing.assert_allclose(got, want, atol=0.3)
    # predictions assign every point to its generating cluster
    pred = np.asarray(km.predict(pts))
    assert len(np.unique(pred[:40])) == 1
    assert len(np.unique(pred[40:80])) == 1


# ---------------------------------------------------------------------------
# histogram matching: output histogram approximates the target's
# ---------------------------------------------------------------------------


def test_histogram_matching_fuzz():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    src = jax.random.uniform(k1, (1, 1, 32, 32)) * 0.5  # dark image
    dst = jax.random.uniform(k2, (1, 1, 32, 32)) * 0.5 + 0.5  # bright
    out = C.histogram_matching(src, dst)
    assert out.shape == src.shape
    # matched image moves toward the target's distribution
    assert abs(float(out.mean()) - float(dst.mean())) < 0.05
    assert float(src.mean()) < 0.3 < float(out.mean())


# ---------------------------------------------------------------------------
# diamond-square: shape/range/determinism
# ---------------------------------------------------------------------------


def test_diamond_square_contract():
    out = C.diamond_square((1, 1, 17, 17), random_scale=0.5,
                           key=jax.random.PRNGKey(0))
    assert out.shape == (1, 1, 17, 17)
    assert bool(jnp.isfinite(out).all())
    out2 = C.diamond_square((1, 1, 17, 17), random_scale=0.5,
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=0)


# ---------------------------------------------------------------------------
# Mix augmentations: label algebra + pixel provenance
# ---------------------------------------------------------------------------


def test_mixup_label_algebra_fuzz():
    import kornia_tpu.augmentation as A
    x = jax.random.uniform(jax.random.PRNGKey(4), (4, 3, 16, 16))
    y = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    op = A.RandomMixUpV2(p=1.0)
    out, lab = op(x, y, key=jax.random.PRNGKey(5))
    assert out.shape == x.shape
    # labels are (B, 3): [y_a, y_b, lam]
    assert lab.shape[-1] == 3
    lam = np.asarray(lab[:, 2])
    assert (lam >= 0).all() and (lam <= 1).all()
    # mixed pixels are convex combinations: within [min, max] of sources
    ya = np.asarray(lab[:, 0]).astype(int)
    lo = np.minimum(np.asarray(x), np.asarray(x)[::-1].min())
    assert float(out.min()) >= float(x.min()) - 1e-5
    assert float(out.max()) <= float(x.max()) + 1e-5


def test_cutmix_pixel_provenance_fuzz():
    import kornia_tpu.augmentation as A
    B = 2
    x0 = jnp.zeros((1, 1, 16, 16))
    x1 = jnp.ones((1, 1, 16, 16))
    x = jnp.concatenate([x0, x1], 0)
    y = jnp.asarray([0.0, 1.0])
    op = A.RandomCutMixV2(p=1.0)
    out, lab = op(x, y, key=jax.random.PRNGKey(6))
    o = np.asarray(out)
    # every output pixel comes from one of the two inputs exactly
    assert np.isin(np.round(o, 5), [0.0, 1.0]).all()
