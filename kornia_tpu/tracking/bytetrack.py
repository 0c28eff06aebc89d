"""Multi-object tracker (ByteTrack-style two-round association), TPU-native.

Reference behavior: kornia/contrib/boxmot_tracker.py:40 (BoxMotTracker —
detector + boxmot tracker facade; update() feeds (x, y, x, y, conf, cls)
detections, tracker returns per-frame ids). The reference delegates the
actual tracking to the external `boxmot` package (ByteTrack / OC-SORT
family: Kalman constant-velocity motion + IoU association with high/low
score rounds, per Zhang et al. 2021, arXiv:2110.06864).

TPU-first redesign (NOT a port):
- The track table is a FIXED-CAPACITY pytree (`TrackState`): every frame
  update — batched Kalman predict/update, IoU cost, two greedy association
  rounds via `lax.scan` (no Hungarian host round-trip), birth/death
  bookkeeping — is ONE jitted executable with static shapes.
- Detections arrive padded (N, 6) with score-0 invalid rows, exactly the
  contract of `contrib.ObjectDetector`, so the detector and tracker fuse
  into a single compiled per-frame step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["TrackState", "ByteTracker", "BoxTracker"]

# ByteTrack Kalman: state [cx, cy, a, h, vcx, vcy, va, vh]
_STD_POS = 1.0 / 20.0
_STD_VEL = 1.0 / 160.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrackState:
    """Fixed-capacity track table; a pytree so the whole frame update jits."""

    mean: jax.Array        # (T, 8)
    cov: jax.Array         # (T, 8, 8)
    score: jax.Array       # (T,)
    cls: jax.Array         # (T,)
    track_id: jax.Array    # (T,) int32; 0 = unassigned
    alive: jax.Array       # (T,) bool — slot holds a track (active or lost)
    misses: jax.Array      # (T,) frames since last match (0 = matched now)
    next_id: jax.Array     # () int32

    def tree_flatten(self):
        return ((self.mean, self.cov, self.score, self.cls, self.track_id,
                 self.alive, self.misses, self.next_id), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def empty(cls, capacity: int = 128) -> "TrackState":
        return cls(
            mean=jnp.zeros((capacity, 8)),
            cov=jnp.tile(jnp.eye(8)[None], (capacity, 1, 1)),
            score=jnp.zeros((capacity,)),
            cls=jnp.zeros((capacity,)),
            track_id=jnp.zeros((capacity,), jnp.int32),
            alive=jnp.zeros((capacity,), bool),
            misses=jnp.zeros((capacity,), jnp.int32),
            next_id=jnp.asarray(1, jnp.int32),
        )

    def boxes_xyxy(self) -> jax.Array:
        """Current track boxes (T, 4) xyxy."""
        cx, cy, a, h = (self.mean[:, i] for i in range(4))
        w = a * h
        return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _xyxy_to_meas(b: jax.Array) -> jax.Array:
    """(..., 4) xyxy -> (..., 4) [cx, cy, aspect, h]."""
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([b[..., 0] + w / 2, b[..., 1] + h / 2,
                      w / jnp.maximum(h, 1e-6), h], -1)


def _kf_predict(mean: jax.Array, cov: jax.Array
                ) -> Tuple[jax.Array, jax.Array]:
    F = jnp.eye(8).at[:4, 4:].set(jnp.eye(4))
    h = mean[:, 3]
    std = jnp.stack([_STD_POS * h, _STD_POS * h,
                     jnp.full_like(h, 1e-2), _STD_POS * h,
                     _STD_VEL * h, _STD_VEL * h,
                     jnp.full_like(h, 1e-5), _STD_VEL * h], -1)
    Q = jnp.square(std)[:, :, None] * jnp.eye(8)
    mean = mean @ F.T
    cov = jnp.einsum("ij,njk,lk->nil", F, cov, F) + Q
    return mean, cov


def _kf_update(mean: jax.Array, cov: jax.Array, meas: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    H = jnp.eye(4, 8)
    h = mean[:, 3]
    std = jnp.stack([_STD_POS * h, _STD_POS * h,
                     jnp.full_like(h, 1e-1), _STD_POS * h], -1)
    R = jnp.square(std)[:, :, None] * jnp.eye(4)
    S = jnp.einsum("ij,njk,lk->nil", H, cov, H) + R          # (T, 4, 4)
    PHt = jnp.einsum("nij,kj->nik", cov, H)                   # (T, 8, 4)
    K = jnp.transpose(
        jnp.linalg.solve(S, jnp.transpose(PHt, (0, 2, 1))), (0, 2, 1))
    innov = meas - mean @ H.T
    mean = mean + jnp.einsum("nij,nj->ni", K, innov)
    cov = cov - jnp.einsum("nij,njk,nlk->nil", K, S, K)
    return mean, cov


def _iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """a (T, 4), b (D, 4) xyxy -> IoU (T, D)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    return inter / jnp.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def _greedy_match(iou: jax.Array, row_ok: jax.Array, col_ok: jax.Array,
                  thresh: float) -> Tuple[jax.Array, jax.Array]:
    """Greedy max-IoU assignment via lax.scan.

    Returns (row_to_col (T,) int32 with -1 unmatched, col_matched (D,) bool).
    """
    T, D = iou.shape
    masked = jnp.where(row_ok[:, None] & col_ok[None, :], iou, -1.0)

    def body(carry, _):
        m, r2c, cmatch = carry
        flat = jnp.argmax(m)
        r, c = flat // D, flat % D
        ok = m[r, c] > thresh
        r2c = jnp.where(ok, r2c.at[r].set(c.astype(jnp.int32)), r2c)
        cmatch = jnp.where(ok, cmatch.at[c].set(True), cmatch)
        m = jnp.where(ok, m.at[r, :].set(-1.0).at[:, c].set(-1.0), m)
        return (m, r2c, cmatch), None

    init = (masked, jnp.full((T,), -1, jnp.int32), jnp.zeros((D,), bool))
    (_, r2c, cmatch), _ = jax.lax.scan(body, init, None,
                                       length=min(T, D))
    return r2c, cmatch


class ByteTracker:
    """Jitted two-round IoU tracker over a fixed-capacity track table.

    update(state, detections) with detections (N, 6) rows
    (class, score, x, y, w, h) — padded rows have score 0 — returns the new
    state. Read results with `current_tracks`.
    """

    def __init__(self, capacity: int = 128,
                 track_high_thresh: float = 0.5,
                 track_low_thresh: float = 0.1,
                 new_track_thresh: float = 0.6,
                 match_thresh: float = 0.3,
                 second_match_thresh: float = 0.5,
                 track_buffer: int = 30):
        self.capacity = capacity
        self.high = track_high_thresh
        self.low = track_low_thresh
        self.new = new_track_thresh
        self.match_thresh = match_thresh
        self.second_match_thresh = second_match_thresh
        self.buffer = track_buffer
        self._step = jax.jit(self._update)

    def init_state(self) -> TrackState:
        return TrackState.empty(self.capacity)

    def update(self, state: TrackState, detections: jax.Array) -> TrackState:
        return self._step(state, as_float(detections))

    # --- jitted frame step -------------------------------------------------
    def _update(self, s: TrackState, det: jax.Array) -> TrackState:
        boxes = jnp.stack([det[:, 2], det[:, 3],
                           det[:, 2] + det[:, 4], det[:, 3] + det[:, 5]], -1)
        scores = det[:, 1]
        cls = det[:, 0]
        d_high = scores > self.high
        d_low = (scores > self.low) & ~d_high

        mean, cov = _kf_predict(s.mean, s.cov)
        s = dataclasses.replace(s, mean=mean, cov=cov)
        tboxes = s.boxes_xyxy()
        iou = _iou_matrix(tboxes, boxes)

        # round 1: all alive tracks vs high-score detections
        r2c1, cm1 = _greedy_match(iou, s.alive, d_high, self.match_thresh)
        m1 = r2c1 >= 0
        # round 2: still-unmatched ACTIVE tracks vs low-score detections
        active = s.alive & (s.misses == 0)
        r2c2, cm2 = _greedy_match(iou, active & ~m1, d_low,
                                  self.second_match_thresh)
        m2 = r2c2 >= 0
        matched = m1 | m2
        det_idx = jnp.where(m1, r2c1, jnp.maximum(r2c2, 0))

        # Kalman-update matched slots with their detection
        meas = _xyxy_to_meas(boxes)[det_idx]
        new_mean, new_cov = _kf_update(s.mean, s.cov, meas)
        mean = jnp.where(matched[:, None], new_mean, s.mean)
        cov = jnp.where(matched[:, None, None], new_cov, s.cov)
        score = jnp.where(matched, scores[det_idx], s.score)
        tcls = jnp.where(matched, cls[det_idx], s.cls)
        misses = jnp.where(matched, 0, s.misses + 1)
        alive = s.alive & (misses <= self.buffer)

        # births: unmatched high-score dets above new_track_thresh -> free slots
        birth_det = d_high & ~cm1 & (scores > self.new)
        free = ~alive
        # rank free slots and birth candidates; pair k-th free slot with k-th
        # candidate (static-shape argsorts instead of dynamic compaction)
        free_rank = jnp.cumsum(free) - 1                      # (T,)
        cand_rank = jnp.cumsum(birth_det) - 1                 # (D,)
        n_birth = jnp.minimum(jnp.sum(free), jnp.sum(birth_det))
        cand_order = jnp.argsort(jnp.where(birth_det, cand_rank, 1 << 30))
        take = jnp.where(free & (free_rank < n_birth), free_rank, 0)
        src = cand_order[take]                                # (T,) det index
        is_birth = free & (free_rank < n_birth)

        bmeas = _xyxy_to_meas(boxes)[src]
        bmean = jnp.concatenate([bmeas, jnp.zeros_like(bmeas)], -1)
        h0 = bmeas[:, 3]
        bstd = jnp.stack([2 * _STD_POS * h0, 2 * _STD_POS * h0,
                          jnp.full_like(h0, 1e-2), 2 * _STD_POS * h0,
                          10 * _STD_VEL * h0, 10 * _STD_VEL * h0,
                          jnp.full_like(h0, 1e-5), 10 * _STD_VEL * h0], -1)
        bcov = jnp.square(bstd)[:, :, None] * jnp.eye(8)

        mean = jnp.where(is_birth[:, None], bmean, mean)
        cov = jnp.where(is_birth[:, None, None], bcov, cov)
        score = jnp.where(is_birth, scores[src], score)
        tcls = jnp.where(is_birth, cls[src], tcls)
        misses = jnp.where(is_birth, 0, misses)
        new_ids = s.next_id + free_rank.astype(jnp.int32)
        track_id = jnp.where(is_birth, new_ids, s.track_id)
        next_id = s.next_id + n_birth.astype(jnp.int32)
        alive = alive | is_birth

        return TrackState(mean, cov, score, tcls, track_id, alive, misses,
                          next_id)

    def current_tracks(self, s: TrackState
                       ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                  jax.Array, jax.Array]:
        """-> (boxes (T, 4) xyxy, ids (T,), scores, cls, valid) — valid is
        alive AND matched this frame."""
        valid = s.alive & (s.misses == 0)
        return s.boxes_xyxy(), s.track_id, s.score, s.cls, valid


class BoxTracker:
    """Detector + tracker facade (boxmot_tracker.py BoxMotTracker:40).

    update(image (1, 3, H, W)) runs the detector and advances the tracker;
    returns (boxes (T, 4) xyxy, ids (T,), scores (T,), cls (T,), valid (T,)).
    """

    def __init__(self, detector=None, tracker: Optional[ByteTracker] = None):
        if detector is None:
            from ..contrib.detection import ObjectDetector
            detector = ObjectDetector()
        self.detector = detector
        self.tracker = tracker or ByteTracker()
        self.state = self.tracker.init_state()
        self.frame_count = 0

    def reset(self):
        self.state = self.tracker.init_state()
        self.frame_count = 0

    def update(self, image: jax.Array):
        dets = self.detector(image)[0]  # (N, 6) class, score, x, y, w, h
        self.state = self.tracker.update(self.state, dets)
        self.frame_count += 1
        return self.tracker.current_tracks(self.state)

    def visualize(self, image: jax.Array) -> jax.Array:
        """Draw current track boxes onto (1, 3, H, W) image."""
        from ..image.draw import draw_rectangle
        boxes, ids, _sc, _cls, valid = self.tracker.current_tracks(self.state)
        n = int(jnp.sum(valid))
        if n == 0:
            return image
        sel = jnp.asarray(jnp.nonzero(valid, size=n)[0])
        rect = boxes[sel][None]  # (1, n, 4) xyxy
        return draw_rectangle(image, rect, color=jnp.asarray([1.0, 0.0, 0.0]))
