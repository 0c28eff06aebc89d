"""Augmentation framework core
(reference: kornia/augmentation/base.py:277-502 + _2d/base.py).

TPU-first redesign of the reference's class hierarchy:
  * Parameter generation is a pure function of a PRNG key — the reference
    samples on CPU for device-stable RNG (random_generator/base.py:54);
    JAX keys are deterministic everywhere by construction.
  * Probability gating (`p`, `p_batch`) is a boolean `apply_mask` in the
    params dict; application computes the op for the whole batch and
    selects with `jnp.where` — no data-dependent control flow, XLA fuses
    the select into the op. (The reference's measured ~78%% dispatch
    overhead, benchmarks/augmentation/README.md:96-101, disappears: a
    whole pipeline jits into one kernel graph.)
  * Geometric ops expose `compute_transformation` → (B, 3, 3); the
    container composes matrices for boxes/keypoints transforms and exact
    inverses, mirroring the reference's matrix bookkeeping
    (base.py:363-502).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float

__all__ = ["AugmentationBase2D", "IntensityAugmentationBase2D",
           "GeometricAugmentationBase2D", "apply_batch_mask"]


def apply_batch_mask(out: jax.Array, inp: jax.Array, mask: jax.Array
                     ) -> jax.Array:
    """Select augmented vs original per batch element."""
    m = mask.reshape(-1, *([1] * (inp.ndim - 1)))
    return jnp.where(m, out, inp)


class AugmentationBase2D:
    """Base class (reference: augmentation/base.py:310 _AugmentationBase).

    Subclasses implement `sample_params(key, batch, shape)` and
    `apply(x, params)`; geometric ops also `matrix(params, shape)`.
    """

    def __init__(self, p: float = 0.5, p_batch: float = 1.0,
                 same_on_batch: bool = False, keepdim: bool = False):
        self.p = p
        self.p_batch = p_batch
        self.same_on_batch = same_on_batch
        self.flags: Dict[str, Any] = {}

    # -- override points -----------------------------------------------------
    def sample_params(self, key: jax.Array, batch: int,
                      shape: Tuple[int, ...]) -> Dict[str, jax.Array]:
        return {}

    def apply(self, x: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
        raise NotImplementedError

    def matrix(self, params: Dict[str, jax.Array],
               shape: Tuple[int, ...]) -> jax.Array:
        """Identity unless geometric."""
        B = params["apply_mask"].shape[0]
        return jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

    # -- machinery -----------------------------------------------------------
    def generate_parameters(self, key: jax.Array, shape: Tuple[int, ...]
                            ) -> Dict[str, jax.Array]:
        B = shape[0]
        k_gate, k_batchgate, k_params = jax.random.split(key, 3)
        if self.same_on_batch:
            elem = jax.random.bernoulli(k_gate, self.p, ())
            elem = jnp.broadcast_to(elem, (B,))
        else:
            elem = jax.random.bernoulli(k_gate, self.p, (B,))
        batch_gate = jax.random.bernoulli(k_batchgate, self.p_batch, ())
        mask = elem & batch_gate
        params = self.sample_params(k_params, B, shape)
        params["apply_mask"] = mask
        return params

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None,
                 params: Optional[Dict[str, jax.Array]] = None) -> jax.Array:
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        out = self.apply(x, params)
        return apply_batch_mask(out, x, params["apply_mask"])

    def transform_matrix(self, x: jax.Array, params: Dict[str, jax.Array]
                         ) -> jax.Array:
        M = self.matrix(params, x.shape)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
        m = params["apply_mask"].reshape(-1, 1, 1)
        return jnp.where(m, M, eye)

    # -- container extension points (reference: base.py:363-502 per-datatype
    # transform_inputs/masks/boxes/keypoints; _2d/geometric/base.py:77-160)
    def out_size(self, in_hw: Tuple[int, int]) -> Tuple[int, int]:
        """Static output (H, W) for input (H, W) — size-changing ops
        (crop/resize/pad) override."""
        return in_hw

    def apply_to_mask(self, m: jax.Array, params: Dict[str, jax.Array],
                      in_hw: Tuple[int, int]) -> jax.Array:
        """Mask path: intensity ops leave masks unchanged (reference:
        _2d/intensity/base.py:49)."""
        return m

    def transform_coords(self, pts: jax.Array, params: Dict[str, jax.Array],
                         in_hw: Tuple[int, int]) -> jax.Array:
        """(B, ..., 2) point action — identity for intensity ops."""
        return pts

    def inverse_coords(self, pts: jax.Array, params: Dict[str, jax.Array],
                       in_hw: Tuple[int, int]) -> jax.Array:
        return pts

    def inverse_image(self, x: jax.Array, params: Dict[str, jax.Array],
                      in_hw: Tuple[int, int], mode: str = "bilinear"
                      ) -> jax.Array:
        """Per-op inverse replay (reference: container/augment.py:303) —
        intensity ops are treated as non-invertible no-ops, matching the
        reference's inverse semantics."""
        return x

    # -- uniform-sampling helper --------------------------------------------
    def _uniform(self, key: jax.Array, batch: int, lo, hi,
                 shape: Tuple[int, ...] = ()) -> jax.Array:
        if self.same_on_batch:
            v = jax.random.uniform(key, shape, minval=lo, maxval=hi)
            return jnp.broadcast_to(v, (batch, *shape))
        return jax.random.uniform(key, (batch, *shape), minval=lo, maxval=hi)


class IntensityAugmentationBase2D(AugmentationBase2D):
    """Marker base: never changes geometry (reference:
    _2d/intensity/base.py:27)."""


class GeometricAugmentationBase2D(AugmentationBase2D):
    """Geometric ops are invertible through their 3x3 matrix (reference:
    _2d/geometric/base.py:29)."""

    def apply(self, x: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
        from ..ops.warp import warp_perspective
        M = self.matrix(params, x.shape)
        H, W = x.shape[-2:]
        return warp_perspective(x, M, (H, W), mode=self.flags.get(
            "resample", "bilinear"), padding_mode=self.flags.get(
            "padding_mode", "zeros"), align_corners=True)

    def inverse(self, x: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
        from ..core.linalg import inverse_3x3
        from ..ops.warp import warp_perspective
        M = self.transform_matrix(x, params)
        H, W = x.shape[-2:]
        return warp_perspective(x, inverse_3x3(M), (H, W), align_corners=True)

    # -- container extension points (reference: base.py:403-502) ----------
    def _gated_matrix(self, params: Dict[str, jax.Array],
                      in_hw: Tuple[int, int]) -> jax.Array:
        B = params["apply_mask"].shape[0]
        M = self.matrix(params, (B, 1, *in_hw))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
        return jnp.where(params["apply_mask"].reshape(-1, 1, 1), M, eye)

    def apply_to_mask(self, m: jax.Array, params: Dict[str, jax.Array],
                      in_hw: Tuple[int, int]) -> jax.Array:
        """Reference transform_masks (base.py:403): the op's OWN apply with
        nearest resampling — covers matrix warps AND deformation fields
        (elastic/TPS), which a composed 3x3 cannot express."""
        old = dict(self.flags)
        self.flags = {**self.flags, "resample": "nearest"}
        try:
            out = self.apply(m, params)
        finally:
            self.flags = old
        if out.shape == m.shape:
            return apply_batch_mask(out, m, params["apply_mask"])
        return out  # size-changing ops apply unconditionally (p=1)

    def transform_coords(self, pts: jax.Array, params: Dict[str, jax.Array],
                         in_hw: Tuple[int, int]) -> jax.Array:
        from ..geometry.linalg import transform_points
        M = self._gated_matrix(params, in_hw)
        B = pts.shape[0]
        flat = pts.reshape(B, -1, 2)
        return transform_points(M, flat).reshape(pts.shape)

    def inverse_coords(self, pts: jax.Array, params: Dict[str, jax.Array],
                       in_hw: Tuple[int, int]) -> jax.Array:
        from ..core.linalg import inverse_3x3
        from ..geometry.linalg import transform_points
        M = inverse_3x3(self._gated_matrix(params, in_hw))
        B = pts.shape[0]
        flat = pts.reshape(B, -1, 2)
        return transform_points(M, flat).reshape(pts.shape)

    def inverse_image(self, x: jax.Array, params: Dict[str, jax.Array],
                      in_hw: Tuple[int, int], mode: str = "bilinear"
                      ) -> jax.Array:
        """Per-op inverse replay to the op's INPUT frame (handles
        size-changing crops: dsize = in_hw)."""
        from ..core.linalg import inverse_3x3
        from ..ops.warp import warp_perspective
        M = inverse_3x3(self._gated_matrix(params, in_hw))
        return warp_perspective(x, M, in_hw, mode=mode, align_corners=True)


class RigidAffineAugmentationBase2D(GeometricAugmentationBase2D):
    """Ops whose transform is a rigid/affine 3x3 (reference:
    _2d/base.py:67 RigidAffineAugmentationBase2D)."""


__all__ += ["RigidAffineAugmentationBase2D"]
