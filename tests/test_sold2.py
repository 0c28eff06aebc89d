"""SOLD2-style line segment detection/matching tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.feature.sold2 import (
    SOLD2,
    SOLD2_detector,
    _refine_heatmap,
    adjacency_to_segments,
    detect_line_segments,
    match_lines_nw,
    prob_to_junctions,
)


def _two_line_heatmap(H=64, W=64):
    heat = np.zeros((H, W), np.float32)
    heat[20, 10:51] = 1.0
    heat[10:41, 40] = 1.0
    return jnp.asarray(heat)


class TestLineDetection:
    def test_detects_planted_lines(self):
        heat = _two_line_heatmap()
        junc = jnp.array([[20.0, 10.0], [20.0, 50.0], [10.0, 40.0],
                          [40.0, 40.0], [5.0, 5.0]])
        valid = jnp.ones(5, bool)
        adj, score = detect_line_segments(
            junc, valid, heat, use_candidate_suppression=False,
            use_heatmap_refinement=False)
        a = np.asarray(adj)
        assert a[0, 1] and a[1, 0]       # horizontal line
        assert a[2, 3] and a[3, 2]       # vertical line
        assert not a[0, 2] and not a[4].any()  # no spurious pairs
        segs, mask = adjacency_to_segments(junc, adj, score, max_segments=8)
        assert int(mask.sum()) == 2

    def test_candidate_suppression_splits_long_segment(self):
        heat = _two_line_heatmap()
        junc = jnp.array([[20.0, 10.0], [20.0, 50.0], [20.0, 30.0]])
        valid = jnp.ones(3, bool)
        adj, _ = detect_line_segments(junc, valid, heat,
                                      use_heatmap_refinement=False)
        a = np.asarray(adj)
        assert not a[0, 1]               # long pair passes through junction 2
        assert a[0, 2] and a[2, 1]       # sub-segments survive

    def test_invalid_junctions_never_pair(self):
        heat = _two_line_heatmap()
        junc = jnp.array([[20.0, 10.0], [20.0, 50.0]])
        valid = jnp.array([True, False])
        adj, _ = detect_line_segments(junc, valid, heat,
                                      use_heatmap_refinement=False)
        assert not bool(np.asarray(adj).any())

    def test_refine_heatmap_normalizes(self):
        weak = _two_line_heatmap() * 0.3
        ref = _refine_heatmap(weak)
        assert float(ref.max()) == pytest.approx(1.0)
        assert float(ref.min()) >= 0.0

    def test_prob_to_junctions_finds_peaks(self):
        prob = np.zeros((32, 32), np.float32)
        prob[5, 7] = 0.9
        prob[20, 25] = 0.8
        junc, valid = prob_to_junctions(jnp.asarray(prob), max_junctions=8)
        got = {tuple(map(int, j)) for j, v in
               zip(np.asarray(junc), np.asarray(valid)) if v}
        assert got == {(5, 7), (20, 25)}


class TestSOLD2Model:
    def test_detector_forward_shapes(self):
        det = SOLD2_detector(max_junctions=16, max_segments=8, num_samples=8)
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 1, 64, 64))
        out = det(img)
        assert out["junction_heatmap"].shape == (2, 64, 64)
        assert out["line_heatmap"].shape == (2, 64, 64)
        assert out["line_segments"].shape == (2, 8, 2, 2)
        assert out["line_mask"].shape == (2, 8)

    def test_full_model_with_descriptors_and_match(self):
        det = SOLD2(max_junctions=16, max_segments=8, num_samples=8)
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 64, 64))
        out = det(img)
        assert out["dense_desc"].shape == (1, 128, 16, 16)
        m = det.match(out, out)
        assert m.shape == (8,)

    def test_heatmaps_are_probabilities(self):
        det = SOLD2_detector(max_junctions=8, max_segments=4, num_samples=8)
        img = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 64, 64))
        out = det(img)
        for k in ("junction_heatmap", "line_heatmap"):
            v = np.asarray(out[k])
            assert v.min() >= 0.0 and v.max() <= 1.0


class TestLineMatcherNW:
    def test_identity_matching(self):
        key = jax.random.PRNGKey(3)
        d = jax.random.normal(key, (6, 5, 16))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        valid = jnp.ones(6, bool)
        m = match_lines_nw(d, d, valid, valid)
        np.testing.assert_array_equal(np.asarray(m), np.arange(6))

    def test_reversed_direction_still_matches(self):
        key = jax.random.PRNGKey(4)
        d = jax.random.normal(key, (5, 7, 16))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        valid = jnp.ones(5, bool)
        m = match_lines_nw(d, d[:, ::-1], valid, valid)
        np.testing.assert_array_equal(np.asarray(m), np.arange(5))

    def test_invalid_lines_unmatched(self):
        d = jax.random.normal(jax.random.PRNGKey(5), (4, 5, 8))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        valid1 = jnp.array([True, True, False, False])
        m = match_lines_nw(d, d, valid1, jnp.ones(4, bool))
        assert (np.asarray(m)[2:] == -1).all()
