"""Sparse-Schur BA: equivalence with the dense path, GNC convergence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.slam.ba import BAState, bundle_adjust, reprojection_residuals
from kornia_tpu.slam.ba_sparse import (build_point_tables,
                                       bundle_adjust_sparse)
from tests.test_slam import make_ba_problem


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _tables(problem, P):
    oi, om = build_point_tables(problem.cam_idx, problem.pt_idx,
                                problem.valid, P)
    return jnp.asarray(oi), jnp.asarray(om)


def _rms(state, problem):
    r = reprojection_residuals(state, problem)
    return float(jnp.sqrt(jnp.mean(jnp.sum(r * r, -1))))


def test_build_point_tables_groups_by_point():
    cam = np.array([0, 1, 0, 1, 2])
    pt = np.array([0, 0, 1, 2, 2])
    valid = np.ones(5, bool)
    oi, om = build_point_tables(cam, pt, valid, 3)
    assert oi.shape == (3, 2)
    assert om.sum() == 5
    assert set(oi[0][om[0]].tolist()) == {0, 1}
    assert set(oi[2][om[2]].tolist()) == {3, 4}


def test_sparse_matches_dense(key):
    state0, problem, _gt, C, P = make_ba_problem(key)
    oi, om = _tables(problem, P)
    sd, cd = bundle_adjust(state0, problem, C, P, num_iters=10)
    ss, cs = bundle_adjust_sparse(state0, problem, oi, om, C, P,
                                  num_iters=10)
    # both converge to the same optimum
    np.testing.assert_allclose(float(cd[-1]), float(cs[-1]), rtol=1e-3)
    assert _rms(ss, problem) < 0.35  # noise floor for noise=0.3


def test_sparse_padded_tracks(key):
    state0, problem, _gt, C, P = make_ba_problem(key)
    # drop a third of the observations -> ragged tracks, padded tables
    valid = problem.valid & (jnp.arange(problem.valid.shape[0]) % 3 != 0)
    problem2 = dataclasses.replace(problem, valid=valid)
    oi, om = _tables(problem2, P)
    ss, cs = bundle_adjust_sparse(state0, problem2, oi, om, C, P,
                                  num_iters=10)
    assert float(cs[-1]) < float(cs[0])
    assert _rms(ss, problem2) < 0.5


def test_gnc_rescues_tukey_from_bad_init(key):
    state0, problem, _gt, C, P = make_ba_problem(jax.random.PRNGKey(1),
                                                 noise=0.1)
    bad = BAState(state0.poses, state0.points + 0.8 * jax.random.normal(
        jax.random.PRNGKey(5), state0.points.shape))
    oi, om = _tables(problem, P)
    plain, _ = bundle_adjust_sparse(bad, problem, oi, om, C, P,
                                    num_iters=16, robust="tukey",
                                    robust_delta=2.0)
    gnc, _ = bundle_adjust_sparse(bad, problem, oi, om, C, P,
                                  num_iters=16, robust="tukey",
                                  robust_delta=2.0, gnc_stages=4)
    assert _rms(plain, problem) > 10.0   # redescending kernel stalls
    assert _rms(gnc, problem) < 0.3      # GNC reaches the noise floor


def test_gnc_rejects_random_outliers(key):
    state0, problem, _gt, C, P = make_ba_problem(jax.random.PRNGKey(1),
                                                 noise=0.1)
    oi, om = _tables(problem, P)
    out_mask = (jnp.arange(problem.uv.shape[0]) % 7) == 0
    uv_bad = problem.uv + out_mask[:, None] * 30.0 * jax.random.normal(
        jax.random.PRNGKey(9), problem.uv.shape)
    prob_out = dataclasses.replace(problem, uv=uv_bad)
    s, _ = bundle_adjust_sparse(state0, prob_out, oi, om, C, P,
                                num_iters=16, robust="tukey",
                                robust_delta=2.0, gnc_stages=4)
    assert _rms(s, problem) < 0.3  # evaluated against CLEAN observations
