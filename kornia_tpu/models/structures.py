"""Model I/O structures (reference: kornia/models/structures.py —
SegmentationResults:30, Prompts:103) and the NaFlex flexible-resolution
embedding processor (reference: kornia/models/processors/naflex.py:28)."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["SegmentationResults", "Prompts", "NaFlex"]


@dataclasses.dataclass
class SegmentationResults:
    """Results of a segmentation model (reference structures.py:30).

    logits (B, C, H, W); scores (B, C); `binary_masks` thresholds the
    (original-resolution, if computed) logits."""

    logits: jax.Array
    scores: jax.Array
    mask_threshold: float = 0.0
    _original_res_logits: Optional[jax.Array] = None

    @property
    def binary_masks(self) -> jax.Array:
        x = (self._original_res_logits
             if self._original_res_logits is not None else self.logits)
        return x > self.mask_threshold

    def original_res_logits(
            self, input_size: Tuple[int, int],
            original_size: Tuple[int, int],
            image_size_encoder: Optional[Tuple[int, int]]) -> jax.Array:
        """Resize to encoder input -> strip bottom/right padding -> resize
        to the original image size (reference :61-89)."""
        from ..ops.warp import resize
        x = self.logits
        if isinstance(image_size_encoder, tuple):
            x = resize(x, image_size_encoder, "bilinear",
                       align_corners=False)
        x = x[..., :input_size[0], :input_size[1]]
        x = resize(x, original_size, "bilinear", align_corners=False)
        self._original_res_logits = x
        return x

    def squeeze(self, dim: int = 0) -> "SegmentationResults":
        self.logits = jnp.squeeze(self.logits, dim)
        self.scores = jnp.squeeze(self.scores, dim)
        if self._original_res_logits is not None:
            self._original_res_logits = jnp.squeeze(
                self._original_res_logits, dim)
        return self


@dataclasses.dataclass
class Prompts:
    """Prompt inputs for a promptable model (reference structures.py:103)."""

    points: Optional[Tuple[jax.Array, jax.Array]] = None
    boxes: Optional[jax.Array] = None
    masks: Optional[jax.Array] = None

    def __post_init__(self) -> None:
        if self.points is not None and self.boxes is not None:
            if self.points[0].shape[0] != self.boxes.shape[0]:
                raise ValueError(
                    "The prompts should have the same batch size!")

    @property
    def keypoints(self) -> Optional[jax.Array]:
        return self.points[0] if self.points is not None else None

    @property
    def keypoints_labels(self) -> Optional[jax.Array]:
        return self.points[1] if self.points is not None else None


class NaFlex:
    """Flexible-resolution patch embedding: interpolates a square
    position-embedding grid to the input's patch grid
    (reference processors/naflex.py:28)."""

    def __init__(self, patch_embedding_fcn: Callable[[jax.Array], jax.Array],
                 position_embedding: jax.Array):
        self.patch_embedding_fcn = patch_embedding_fcn
        self.position_embedding = position_embedding

    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        emb = self.patch_embedding_fcn(pixel_values)
        if emb.ndim == 4:  # (B, C, H, W)
            b, c, hg, wg = emb.shape
            emb = emb.reshape(b, c, hg * wg).transpose(0, 2, 1)
            n = hg * wg
        else:
            n = emb.shape[1]
            hg = wg = int(round(n ** 0.5))
        pos = self.position_embedding
        if pos.shape[0] == n:
            return emb + pos[None]
        og = int(round(pos.shape[0] ** 0.5))
        if og * og != pos.shape[0]:
            raise ValueError(
                f"Original positional embedding is not a square grid "
                f"(got {pos.shape[0]} embeddings)")
        from ..ops.warp import resize
        grid = pos.reshape(og, og, -1).transpose(2, 0, 1)[None]
        grid = resize(grid, (hg, wg), "bilinear", align_corners=False)
        pos = grid[0].transpose(1, 2, 0).reshape(hg * wg, -1)
        return emb + pos[None].astype(emb.dtype)
