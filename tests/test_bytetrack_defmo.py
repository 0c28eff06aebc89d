"""ByteTracker (TPU-native boxmot analogue) and DeFMO contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.feature.defmo import DeFMO
from kornia_tpu.tracking.bytetrack import BoxTracker, ByteTracker
import pytest

pytestmark = pytest.mark.slow  # heavy leg: run with --runslow

rng = np.random.default_rng(3)


def _det(rows, n=8):
    d = np.zeros((n, 6), np.float32)
    for i, r in enumerate(rows):
        d[i] = r  # (class, score, x, y, w, h)
    return jnp.asarray(d)


def test_bytetrack_two_objects_id_persistence():
    tr = ByteTracker(capacity=16)
    s = tr.init_state()
    for t in range(6):
        s = tr.update(s, _det([(0, 0.9, 10 + 2 * t, 10, 8, 8),
                               (1, 0.8, 50 + 2 * t, 40, 10, 12)]))
    boxes, ids, sc, cls, valid = tr.current_tracks(s)
    v = np.asarray(valid)
    assert v.sum() == 2
    assert sorted(np.asarray(ids)[v].tolist()) == [1, 2]
    # Kalman mean tracks the 2 px/frame motion
    b = np.asarray(boxes)[v]
    assert abs(b[0, 0] - 20) < 1.0 and abs(b[1, 0] - 60) < 1.0


def test_bytetrack_occlusion_recovery():
    tr = ByteTracker(capacity=16)
    s = tr.init_state()
    for t in range(6):
        s = tr.update(s, _det([(0, 0.9, 10 + 2 * t, 10, 8, 8),
                               (1, 0.8, 50 + 2 * t, 40, 10, 12)]))
    for t in range(6, 9):  # object 0 occluded
        s = tr.update(s, _det([(1, 0.8, 50 + 2 * t, 40, 10, 12)]))
    for t in range(9, 11):
        s = tr.update(s, _det([(0, 0.9, 10 + 2 * t, 10, 8, 8),
                               (1, 0.8, 50 + 2 * t, 40, 10, 12)]))
    _, ids, _, _, valid = tr.current_tracks(s)
    v = np.asarray(valid)
    assert sorted(np.asarray(ids)[v].tolist()) == [1, 2]  # no new id born


def test_bytetrack_low_score_second_round():
    tr = ByteTracker(capacity=16)
    s = tr.init_state()
    for t in range(4):
        s = tr.update(s, _det([(0, 0.9, 20 + t, 20, 10, 10)]))
    s = tr.update(s, _det([(0, 0.3, 24.5, 20, 10, 10)]))  # below high thresh
    _, ids, _, _, valid = tr.current_tracks(s)
    assert int(np.asarray(valid).sum()) == 1
    assert np.asarray(ids)[np.asarray(valid)][0] == 1


def test_bytetrack_track_death():
    tr = ByteTracker(capacity=8, track_buffer=2)
    s = tr.init_state()
    for t in range(3):
        s = tr.update(s, _det([(0, 0.9, 20, 20, 10, 10)]))
    for _ in range(4):  # gone longer than buffer
        s = tr.update(s, _det([]))
    assert int(np.asarray(s.alive).sum()) == 0
    # slot is reused with a NEW id
    s = tr.update(s, _det([(0, 0.9, 20, 20, 10, 10)]))
    _, ids, _, _, valid = tr.current_tracks(s)
    assert np.asarray(ids)[np.asarray(valid)][0] == 2


def test_bytetrack_update_is_jitted_pytree():
    tr = ByteTracker(capacity=8)
    s = tr.init_state()
    leaves = jax.tree_util.tree_leaves(s)
    assert all(isinstance(x, jax.Array) for x in leaves)
    s2 = tr.update(s, _det([(0, 0.9, 5, 5, 4, 4)]))
    assert type(s2) is type(s)


def test_boxtracker_facade():
    bt = BoxTracker()
    img = jnp.asarray(rng.random((1, 3, 64, 64)), dtype=jnp.float32)
    boxes, ids, sc, cls, valid = bt.update(img)
    assert boxes.shape[1] == 4 and ids.shape == valid.shape
    bt.reset()
    assert bt.frame_count == 0


def test_defmo_shapes_and_range():
    m = DeFMO(tsr_steps=3)
    x = jnp.asarray(rng.random((1, 6, 32, 48)), dtype=jnp.float32)
    out = m(x)
    assert out.shape == (1, 3, 4, 32, 48)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid RGBA
