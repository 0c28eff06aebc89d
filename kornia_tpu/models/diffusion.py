"""Latent-diffusion dissolving (one-step reverse DDIM), TPU-native.

Reference behavior: kornia/filters/dissolving.py (_DissolvingWraper_HF:28 —
DDIM scheduler with scaled_linear betas 8.5e-4..1.2e-2,
predict_start_from_noise:41, VAE latent scale 0.18215, one_step_dissolve:162
= single UNet noise prediction then x0 prediction; StableDiffusionDissolving
:205) and augmentation/_2d/intensity/dissolving.py (RandomDissolving:27).
The reference downloads HuggingFace SD 1.4/1.5/XL weights via diffusers.

TPU-first redesign (NOT a port):
- The scheduler is closed-form jnp (no diffusers): alphas_cumprod is a
  precomputed table, timestep selection is a static index — the whole
  dissolve (encode -> eps-prediction -> x0 -> decode) is ONE jitted graph.
- VAE and UNet are compact flax modules with SD-shaped interfaces (4-ch
  latents at stride 8, sinusoidal time embedding, res blocks + attention
  at the lowest resolution) — config-scalable to SD-1.5 dims; real
  checkpoints port through the validated torch->JAX converter path (no
  egress in this environment).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.check import check
from ..core.dtype import as_float
from .common import nchw_to_nhwc, nhwc_to_nchw

__all__ = ["DDIMSchedule", "AutoencoderKL", "UNet2dCondition",
           "StableDiffusionDissolving", "DiffusionConfig"]

_LATENT_SCALE = 0.18215  # dissolving.py:152


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    latent_channels: int = 4
    vae_channels: int = 32
    unet_channels: Sequence[int] = (32, 64, 64)
    num_train_timesteps: int = 1000
    num_ddim_steps: int = 50
    beta_start: float = 0.00085
    beta_end: float = 0.012

    @classmethod
    def sd15_like(cls) -> "DiffusionConfig":
        return cls(vae_channels=128, unet_channels=(320, 640, 1280))


class DDIMSchedule:
    """scaled_linear beta schedule + x0 prediction (dissolving.py:41)."""

    def __init__(self, num_train_timesteps: int = 1000,
                 num_ddim_steps: int = 50, beta_start: float = 0.00085,
                 beta_end: float = 0.012):
        betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                             num_train_timesteps) ** 2
        self.alphas_cumprod = jnp.cumprod(1.0 - betas)
        self.num_train_timesteps = num_train_timesteps
        self.num_ddim_steps = num_ddim_steps
        step = num_train_timesteps // num_ddim_steps
        # diffusers DDIM timesteps (descending), steps_offset=1
        self.timesteps = (jnp.arange(num_ddim_steps)[::-1] * step + 1)

    def predict_start_from_noise(self, noise_pred: jax.Array, t: jax.Array,
                                 latent: jax.Array) -> jax.Array:
        a = self.alphas_cumprod[t]
        sqrt_a = jnp.sqrt(a)
        sqrt_1ma = jnp.sqrt(1.0 - a)
        return (latent - sqrt_1ma * noise_pred) / jnp.maximum(sqrt_a, 1e-6)


def _time_embed(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)


class _ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=8)(x)
        h = nn.Conv(self.features, (3, 3))(nn.silu(h))
        h = h + nn.Dense(self.features)(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.Conv(self.features, (3, 3))(nn.silu(h))
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return x + h


class _SelfAttention2d(nn.Module):
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=8)(x).reshape(B, H * W, C)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        return x + h.reshape(B, H, W, C)


class AutoencoderKL(nn.Module):
    """Compact SD-shaped VAE: stride-8 encoder to 4-ch latents + decoder."""

    cfg: DiffusionConfig

    def setup(self):
        ch = self.cfg.vae_channels
        self.enc = [nn.Conv(ch, (3, 3), name="e0")] + [
            nn.Conv(ch * (2 ** i), (3, 3), strides=2, name=f"e{i + 1}")
            for i in range(3)]
        self.enc_out = nn.Conv(self.cfg.latent_channels, (1, 1),
                               name="to_latent")
        self.dec_in = nn.Conv(ch * 4, (3, 3), name="from_latent")
        self.dec = [nn.ConvTranspose(ch * (2 ** (2 - i)), (4, 4),
                                     strides=(2, 2), name=f"d{i}")
                    for i in range(3)]
        self.dec_out = nn.Conv(3, (3, 3), name="to_rgb")

    def encode(self, x):  # (B, H, W, 3) in [-1, 1]
        h = x
        for c in self.enc:
            h = nn.silu(c(h))
        return self.enc_out(h)  # (B, H/8, W/8, 4)

    def decode(self, z):
        h = nn.silu(self.dec_in(z))
        for c in self.dec:
            h = nn.silu(c(h))
        return self.dec_out(h)  # (B, H, W, 3)

    def __call__(self, x):
        return self.decode(self.encode(x))


class UNet2dCondition(nn.Module):
    """Compact SD-shaped eps-prediction UNet (down/mid+attn/up)."""

    cfg: DiffusionConfig

    @nn.compact
    def __call__(self, z, t):
        chs = list(self.cfg.unet_channels)
        temb = _time_embed(t, chs[0] * 4)
        temb = nn.Dense(chs[0] * 4)(nn.silu(nn.Dense(chs[0] * 4)(temb)))
        temb = jnp.broadcast_to(temb, (z.shape[0], temb.shape[-1]))

        h = nn.Conv(chs[0], (3, 3))(z)
        skips = []
        for i, c in enumerate(chs):
            h = _ResBlock(c)(h, temb)
            skips.append(h)
            if i < len(chs) - 1:
                h = nn.Conv(c, (3, 3), strides=2)(h)
        h = _ResBlock(chs[-1])(h, temb)
        h = _SelfAttention2d()(h)
        h = _ResBlock(chs[-1])(h, temb)
        for i, c in enumerate(reversed(chs)):
            h = jnp.concatenate([h, skips.pop()], -1)
            h = _ResBlock(c)(h, temb)
            if i < len(chs) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, 2 * H, 2 * W, C), "nearest")
                h = nn.Conv(c, (3, 3))(h)
        h = nn.GroupNorm(num_groups=8)(h)
        return nn.Conv(self.cfg.latent_channels, (3, 3))(nn.silu(h))


class _DissolveModel(nn.Module):
    cfg: DiffusionConfig

    def setup(self):
        self.vae = AutoencoderKL(self.cfg)
        self.unet = UNet2dCondition(self.cfg)

    def __call__(self, x, t, sqrt_a, sqrt_1ma):
        """Full dissolve in one graph: encode -> eps -> x0 -> decode."""
        z = self.vae.encode(x) * _LATENT_SCALE
        eps = self.unet(z, t)
        x0 = (z - sqrt_1ma * eps) / jnp.maximum(sqrt_a, 1e-6)
        return self.vae.decode(x0 / _LATENT_SCALE)


class StableDiffusionDissolving:
    """One-step reverse-diffusion 'dissolve' (dissolving.py:205).

    dissolve(image (B, 3, H, W) in [0, 1], step in [0, num_ddim_steps))
    -> (B, 3, H, W) in [0, 1]. H, W multiples of 8. The reference indexes
    its REVERSED timestep as `num_ddim_steps - timesteps[i]`
    (one_step_dissolve:167); mirrored here.
    """

    def __init__(self, cfg: Optional[DiffusionConfig] = None,
                 params: Optional[dict] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or DiffusionConfig()
        self.schedule = DDIMSchedule(
            self.cfg.num_train_timesteps, self.cfg.num_ddim_steps,
            self.cfg.beta_start, self.cfg.beta_end)
        self.model = _DissolveModel(self.cfg)
        self.params = params
        self._key = key if key is not None else jax.random.PRNGKey(0)

    def _init(self):
        x = jnp.zeros((1, 32, 32, 3))
        one = jnp.asarray(1.0)
        self.params = self.model.init(self._key, x, jnp.asarray(1), one,
                                      one)

    def dissolve(self, image: jax.Array, step: int) -> jax.Array:
        B, C, H, W = image.shape
        check(C == 3, f"dissolve expects RGB (B, 3, H, W), got C={C}")
        check(H % 8 == 0 and W % 8 == 0,
              f"H, W must be multiples of 8, got {H}x{W}")
        if self.params is None:
            self._init()
        x = nchw_to_nhwc(as_float(image)) * 2.0 - 1.0
        # the reference computes t = num_ddim_steps - timesteps[i], which is
        # NEGATIVE for all but the last steps and relies on torch's
        # negative-index wraparound into alphas_cumprod
        # (one_step_dissolve:167); the modulo reproduces that exactly
        t = jnp.mod(self.cfg.num_ddim_steps - self.schedule.timesteps[step],
                    self.cfg.num_train_timesteps)
        a = self.schedule.alphas_cumprod[t]
        out = self.model.apply(self.params, x, t, jnp.sqrt(a),
                               jnp.sqrt(1.0 - a))
        return jnp.clip(nhwc_to_nchw(out) / 2.0 + 0.5, 0.0, 1.0)

    __call__ = dissolve
