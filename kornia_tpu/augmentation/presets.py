"""Augmentation presets (reference: kornia/augmentation/presets/ada.py:40
AdaptiveDiscriminatorAugmentation — StyleGAN2-ADA)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .container import ImageSequential
from .geometric import RandomAffine, RandomHorizontalFlip
from .intensity import ColorJiggle, RandomBrightness, RandomErasing

__all__ = ["AdaptiveDiscriminatorAugmentation"]


class AdaptiveDiscriminatorAugmentation:
    """ADA: the augmentation probability `p` auto-tunes from the
    discriminator-overfit heuristic r_t = E[sign(D(real))]
    (reference: presets/ada.py — p steps toward keeping r_t at `target`).

    Usage in a GAN loop:
        ada = AdaptiveDiscriminatorAugmentation()
        imgs_aug = ada(imgs, key)
        ada.update(d_real_logits)   # host-side p adaptation per step
    """

    def __init__(self, target: float = 0.6, adjustment_speed: float = 0.01,
                 p_max: float = 0.8):
        self.target = target
        self.adjustment_speed = adjustment_speed
        self.p_max = p_max
        self.p = 0.0

    def _pipeline(self) -> ImageSequential:
        p = self.p
        return ImageSequential(
            RandomHorizontalFlip(p=p),
            RandomAffine(degrees=10.0, translate=(0.1, 0.1), p=p),
            ColorJiggle(0.2, 0.2, 0.2, 0.05, p=p),
            RandomBrightness((0.9, 1.1), p=p),
            RandomErasing(p=0.5 * p),
        )

    def __call__(self, images: jax.Array,
                 key: Optional[jax.Array] = None) -> jax.Array:
        if self.p <= 0.0:
            return as_float(images)
        return self._pipeline()(images, key)

    def update(self, d_real_logits: jax.Array) -> float:
        """Adapt p from discriminator outputs on REAL samples."""
        r_t = float(jnp.mean(jnp.sign(d_real_logits)))
        if r_t > self.target:
            self.p = min(self.p + self.adjustment_speed, self.p_max)
        else:
            self.p = max(self.p - self.adjustment_speed, 0.0)
        return self.p
