"""Label-transforming mix augmentations
(reference: kornia/augmentation/_2d/mix/, ~1.6k LoC)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from .base import AugmentationBase2D

__all__ = ["RandomMixUpV2", "RandomCutMixV2", "RandomMosaic", "RandomJigsaw",
           "RandomTransplantation", "RandomPatchMix"]


class RandomMixUpV2(AugmentationBase2D):
    """x ← λ x + (1-λ) x[perm]; labels returned as (y_a, y_b, λ)
    (reference: _2d/mix/mixup.py)."""

    def __init__(self, lambda_val=(0.0, 1.0), **kw):
        super().__init__(**kw)
        self.lambda_val = lambda_val

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        lam = self._uniform(k1, batch, *self.lambda_val)
        perm = jax.random.permutation(k2, batch)
        return {"lam": lam, "perm": perm}

    def __call__(self, x, labels=None, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        lam = jnp.where(params["apply_mask"], params["lam"], 0.0)
        lam4 = lam.reshape(-1, 1, 1, 1)
        out = (1.0 - lam4) * x + lam4 * x[params["perm"]]
        if labels is None:
            return out, params
        mixed = jnp.stack(
            [labels.astype(jnp.float32),
             labels[params["perm"]].astype(jnp.float32), lam], axis=-1)
        return out, mixed


class RandomCutMixV2(AugmentationBase2D):
    """Paste a random rectangle from a permuted batch
    (reference: _2d/mix/cutmix.py)."""

    def __init__(self, num_mix: int = 1, beta: float = 1.0, **kw):
        super().__init__(**kw)
        self.num_mix = num_mix
        self.beta = beta

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lam = jax.random.beta(k1, self.beta, self.beta, (batch,))
        cut = jnp.sqrt(1.0 - lam)
        h = cut * H
        w = cut * W
        cy = jax.random.uniform(k2, (batch,)) * H
        cx = jax.random.uniform(k3, (batch,)) * W
        perm = jax.random.permutation(k4, batch)
        return {"h": h, "w": w, "cy": cy, "cx": cx, "perm": perm}

    def __call__(self, x, labels=None, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        B, C, H, W = x.shape
        ys = jnp.arange(H, dtype=x.dtype)[None, :, None]
        xs = jnp.arange(W, dtype=x.dtype)[None, None, :]
        y0 = jnp.clip(params["cy"] - params["h"] / 2, 0, H)[:, None, None]
        y1 = jnp.clip(params["cy"] + params["h"] / 2, 0, H)[:, None, None]
        x0 = jnp.clip(params["cx"] - params["w"] / 2, 0, W)[:, None, None]
        x1 = jnp.clip(params["cx"] + params["w"] / 2, 0, W)[:, None, None]
        box = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
        box = box & params["apply_mask"][:, None, None]
        out = jnp.where(box[:, None], x[params["perm"]], x)
        lam_actual = 1.0 - jnp.mean(box.astype(x.dtype), axis=(1, 2))
        if labels is None:
            return out, params
        mixed = jnp.stack(
            [labels.astype(jnp.float32),
             labels[params["perm"]].astype(jnp.float32), lam_actual], axis=-1)
        return out, mixed


class RandomMosaic(AugmentationBase2D):
    """4-image mosaic (reference: _2d/mix/mosaic.py). Output keeps the
    input size; the mosaic center is sampled inside the middle half."""

    def __init__(self, output_size: Optional[Tuple[int, int]] = None, **kw):
        super().__init__(**kw)
        self.output_size = output_size

    def sample_params(self, key, batch, shape):
        H, W = shape[-2:]
        k1, k2, k3 = jax.random.split(key, 3)
        cy = self._uniform(k1, batch, 0.25 * H, 0.75 * H)
        cx = self._uniform(k2, batch, 0.25 * W, 0.75 * W)
        perms = jax.vmap(lambda k: jax.random.permutation(k, batch))(
            jax.random.split(k3, 3))
        return {"cy": cy, "cx": cx, "perms": perms}

    def __call__(self, x, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        B, C, H, W = x.shape
        ys = jnp.arange(H, dtype=x.dtype)[None, :, None]
        xs = jnp.arange(W, dtype=x.dtype)[None, None, :]
        top = ys < params["cy"][:, None, None]
        left = xs < params["cx"][:, None, None]
        a = x
        b = x[params["perms"][0]]
        c = x[params["perms"][1]]
        d = x[params["perms"][2]]
        out = jnp.where((top & left)[:, None], a,
                        jnp.where((top & ~left)[:, None], b,
                                  jnp.where((~top & left)[:, None], c, d)))
        return jnp.where(params["apply_mask"][:, None, None, None], out, x)


class RandomPatchMix(AugmentationBase2D):
    """Mix random grid patches between each sample and a permuted donor
    (reference: _2d/mix/patchmix.py). Returns (images, lam) where lam is
    the per-sample fraction of own pixels kept."""

    def __init__(self, grid: Tuple[int, int] = (4, 4), mix_prob: float = 0.5,
                 **kw):
        super().__init__(**kw)
        self.grid = grid
        self.mix_prob = mix_prob

    def sample_params(self, key, batch, shape):
        gy, gx = self.grid
        k1, k2 = jax.random.split(key)
        take_donor = jax.random.bernoulli(k1, self.mix_prob, (batch, gy, gx))
        perm = jax.random.permutation(k2, batch)
        return {"take_donor": take_donor, "perm": perm}

    def __call__(self, x, key=None, params=None):
        x = as_float(x)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, x.shape)
        B, C, H, W = x.shape
        gy, gx = self.grid
        mask_small = params["take_donor"].astype(x.dtype)  # (B, gy, gx)
        mask = jnp.repeat(jnp.repeat(mask_small, H // gy, axis=1),
                          W // gx, axis=2)
        mask = jnp.pad(mask, [(0, 0), (0, H - (H // gy) * gy),
                              (0, W - (W // gx) * gx)])
        gate = params["apply_mask"].astype(x.dtype).reshape(-1, 1, 1)
        mask = mask * gate
        donor = x[params["perm"]]
        out = x * (1 - mask[:, None]) + donor * mask[:, None]
        lam = 1.0 - jnp.mean(mask, axis=(1, 2))
        return out, lam


class RandomTransplantation(AugmentationBase2D):
    """Transplant the pixels of a selected segmentation class from a donor
    (permuted) sample into each image (reference:
    _2d/mix/transplantation.py:353). Inputs: images + int masks."""

    def __init__(self, excluded_labels=(0,), **kw):
        super().__init__(**kw)
        self.excluded_labels = tuple(excluded_labels)

    def sample_params(self, key, batch, shape):
        k1, k2 = jax.random.split(key)
        return {"perm": jax.random.permutation(k1, batch),
                "label_u": jax.random.uniform(k2, (batch,))}

    def __call__(self, images: jax.Array, masks: jax.Array,
                 key=None, params=None):
        images = as_float(images)
        if params is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            params = self.generate_parameters(key, images.shape)
        perm = params["perm"]
        donor_img = images[perm]
        donor_mask = masks[perm]
        # choose a donor label: the highest present label scaled by u,
        # skipping excluded (background) labels
        max_label = jnp.max(donor_mask,
                            axis=tuple(range(1, donor_mask.ndim)))
        label = jnp.ceil(params["label_u"] * jnp.maximum(
            max_label.astype(jnp.float32), 1.0)).astype(masks.dtype)
        # masks are channel-less (B, [D,] H, W); insert the channel axis
        # when pairing with (B, C, [D,] H, W) images
        has_channel = masks.ndim == images.ndim
        m = donor_mask if has_channel else donor_mask[:, None]
        bshape = (-1,) + (1,) * (m.ndim - 1)
        sel = (m == label.reshape(bshape))
        sel = sel & params["apply_mask"].reshape(bshape)
        out_img = jnp.where(sel, donor_img, images)
        m_orig = masks if has_channel else masks[:, None]
        out_mask = jnp.where(sel, m, m_orig)
        if not has_channel:
            out_mask = out_mask[:, 0]
        return out_img, out_mask


class RandomJigsaw(AugmentationBase2D):
    """Shuffle image tiles (reference: _2d/mix/jigsaw.py)."""

    def __init__(self, grid: Tuple[int, int] = (4, 4), **kw):
        super().__init__(**kw)
        self.grid = grid

    def sample_params(self, key, batch, shape):
        gy, gx = self.grid
        n = gy * gx
        if self.same_on_batch:
            perm = jax.random.permutation(key, n)
            perm = jnp.broadcast_to(perm, (batch, n))
        else:
            perm = jax.vmap(lambda k: jax.random.permutation(k, n))(
                jax.random.split(key, batch))
        return {"perm": perm}

    def apply(self, x, params):
        B, C, H, W = x.shape
        gy, gx = self.grid
        th, tw = H // gy, W // gx
        tiles = x[:, :, : gy * th, : gx * tw].reshape(B, C, gy, th, gx, tw)
        tiles = tiles.transpose(0, 2, 4, 1, 3, 5).reshape(B, gy * gx, C, th, tw)
        shuffled = jnp.take_along_axis(
            tiles, params["perm"][:, :, None, None, None], axis=1)
        out = shuffled.reshape(B, gy, gx, C, th, tw).transpose(0, 3, 1, 4, 2, 5)
        out = out.reshape(B, C, gy * th, gx * tw)
        if (gy * th, gx * tw) != (H, W):
            out = jnp.pad(out, [(0, 0), (0, 0), (0, H - gy * th),
                                (0, W - gx * tw)])
        return out


class MixAugmentationBaseV2(AugmentationBase2D):
    """Label-transforming mix-augmentation base
    (reference: augmentation/base.py MixAugmentationBaseV2)."""


# the reference exports the class as PatchMix (2d/mix/patchmix.py:27);
# RandomPatchMix is this build's original spelling — keep both
PatchMix = RandomPatchMix


class RandomTransplantation3D(RandomTransplantation):
    """Volumetric transplantation: identical math, (B, C, D, H, W) images
    + (B, D, H, W) masks (reference: _3d/mix/transplantation.py:24 — the
    reference also only swaps the base class; the op is dim-agnostic)."""


__all__ += ["MixAugmentationBaseV2", "PatchMix", "RandomTransplantation3D"]
