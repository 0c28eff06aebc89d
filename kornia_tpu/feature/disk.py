"""DISK keypoint detector + descriptor — exact reference architecture
(reference: kornia/feature/disk/ — disk.py:29-160, _unets/unet.py:28-102,
_unets/blocks.py:25-147, detector.py:27-59) so the published
`depth-save.pth` / `epipolar-save.pth` checkpoints drop in via
`DISK.from_torch`.

TPU-native design: NHWC compute with HWIO weights, static shapes, and a
padded fixed-K keypoint extraction (top-k over the NMS-masked heatmap with
a validity mask) replacing the reference's variable-length nonzero lists.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtype import as_float

__all__ = ["DISK", "DISKFeatures"]

_DOWN = (16, 32, 64, 64, 64)
_UP = (64, 64, 64, 129)  # last = desc_dim + 1


class DISKFeatures:
    """(reference: disk/structs.py:26-89 DISKFeatures) — fixed-K padded:
    keypoints (B, K, 2) xy, descriptors (B, K, D) L2-normalized,
    detection_scores (B, K), valid (B, K)."""

    def __init__(self, keypoints, descriptors, detection_scores, valid):
        self.keypoints = keypoints
        self.descriptors = descriptors
        self.detection_scores = detection_scores
        self.valid = valid

    @property
    def x(self):
        return self.keypoints[..., 0]

    @property
    def y(self):
        return self.keypoints[..., 1]


def _unet_plan() -> List[Dict]:
    """Static layer plan mirroring the reference Unet constructor
    (unet.py:34-61): 5 down blocks then 4 up blocks."""
    plan = []
    down_dims = (3, *_DOWN)
    for i in range(len(_DOWN)):
        plan.append({"kind": "down", "idx": i, "cin": down_dims[i],
                     "cout": down_dims[i + 1], "first": i == 0})
    bot = [_DOWN[-1], *_UP[:-1]]
    hor = down_dims[-2::-1]
    for i, (b, h, o) in enumerate(zip(bot, hor, _UP)):
        plan.append({"kind": "up", "idx": i, "cin": b + h, "cout": o})
    return plan


def _param_specs() -> Dict[str, Tuple[int, ...]]:
    """torch state-dict keys (DISK().state_dict() layout; pretrained
    checkpoints store this under ['extractor'])."""
    specs: Dict[str, Tuple[int, ...]] = {}
    for blk in _unet_plan():
        if blk["kind"] == "down":
            pre = f"unet.path_down.{blk['idx']}.1"
        else:
            pre = f"unet.path_up.{blk['idx']}.conv"
        if not blk.get("first"):
            specs[f"{pre}.1.weight"] = (blk["cin"],)  # PReLU gate
        specs[f"{pre}.3.weight"] = (blk["cout"], blk["cin"], 5, 5)
        specs[f"{pre}.3.bias"] = (blk["cout"],)
    return specs


def disk_init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, jax.Array]:
    params: Dict[str, jax.Array] = {}
    for name, shape in _param_specs().items():
        key, sub = jax.random.split(key)
        if len(shape) == 4:
            o, i, kh, kw = shape
            std = (2.0 / (i * kh * kw)) ** 0.5
            params[name] = jax.random.normal(sub, (kh, kw, i, o), dtype) * std
        elif name.endswith("1.weight"):  # PReLU slope (torch default 0.25)
            params[name] = jnp.full(shape, 0.25, dtype)
        else:
            params[name] = jnp.zeros(shape, dtype)
    return params


def load_torch_weights(state_dict) -> Dict[str, jax.Array]:
    """Convert a torch DISK ``state_dict`` (or a checkpoint's ['extractor'])
    into TPU-layout params: conv (O,I,kH,kW) → HWIO, PReLU as-is."""
    import numpy as np

    params: Dict[str, jax.Array] = {}
    for k, shape in _param_specs().items():
        v = state_dict[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        assert v.shape == tuple(shape), (k, v.shape, shape)
        params[k] = jnp.asarray(v.transpose(2, 3, 1, 0) if v.ndim == 4 else v)
    return params


def _conv_block(p, pre: str, x: jax.Array, first: bool) -> jax.Array:
    """Conv block (blocks.py:70-92): [InstanceNorm → PReLU →] conv5 'same'."""
    if not first:
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        x = (x - mu) * lax.rsqrt(var + 1e-5)
        a = p[f"{pre}.1.weight"].astype(x.dtype)
        x = jnp.where(x >= 0, x, a * x)
    w = p[f"{pre}.3.weight"].astype(x.dtype)
    y = lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p[f"{pre}.3.bias"].astype(x.dtype)


def disk_unet(params: Dict[str, jax.Array], images: jax.Array) -> jax.Array:
    """(B, 3, H, W) → (B, desc_dim+1, H, W); H, W divisible by 16
    (reference unet.py:63-102 forward)."""
    x = jnp.transpose(as_float(images), (0, 2, 3, 1))
    plan = _unet_plan()
    feats = [x]
    for blk in (b for b in plan if b["kind"] == "down"):
        h = feats[-1]
        if not blk["first"]:
            h = lax.reduce_window(h, 0.0, lax.add, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID") * 0.25
        feats.append(_conv_block(
            params, f"unet.path_down.{blk['idx']}.1", h, blk["first"]))
    bot = feats[-1]
    for blk in (b for b in plan if b["kind"] == "up"):
        hor = feats[-2 - blk["idx"]]
        B, H, W, C = bot.shape
        up = jax.image.resize(bot, (B, 2 * H, 2 * W, C), "bilinear")
        bot = _conv_block(params, f"unet.path_up.{blk['idx']}.conv",
                          jnp.concatenate([up, hor], -1), False)
    return jnp.transpose(bot, (0, 3, 1, 2))


class DISK:
    """(reference: disk/disk.py:29-160). `heatmap_and_dense_descriptors` +
    fixed-K NMS keypoint extraction; `DISK.from_torch` for checkpoints."""

    def __init__(self, desc_dim: int = 128,
                 params: Optional[Dict[str, jax.Array]] = None,
                 key: Optional[jax.Array] = None):
        assert desc_dim == _UP[-1] - 1, "pretrained DISK has desc_dim=128"
        self.desc_dim = desc_dim
        self.params = params if params is not None else disk_init_params(
            key if key is not None else jax.random.PRNGKey(0))

    @classmethod
    def from_torch(cls, state_dict) -> "DISK":
        return cls(params=load_torch_weights(state_dict))

    def heatmap_and_dense_descriptors(self, images: jax.Array
                                      ) -> Tuple[jax.Array, jax.Array]:
        """(B, 3, H, W) → (heatmap (B, 1, H, W), descs (B, D, H, W))
        (reference disk.py:59-83; descriptors are the first D channels)."""
        out = disk_unet(self.params, images)
        return out[:, self.desc_dim:], out[:, :self.desc_dim]

    def __call__(self, images: jax.Array, n: int = 512,
                 window_size: int = 5, score_threshold: float = 0.0,
                 pad_if_not_divisible: bool = True) -> DISKFeatures:
        """Padded fixed-K analogue of the reference forward
        (disk.py:85-122 + detector.py:27-59): window NMS → top-n scores,
        invalid rows masked instead of dropped."""
        from ..geometry.subpix import nms2d
        images = as_float(images)
        H, W = images.shape[-2:]
        if pad_if_not_divisible:
            ph, pw = (-H) % 16, (-W) % 16
            images = jnp.pad(images, [(0, 0), (0, 0), (0, ph), (0, pw)])
        heat, desc = self.heatmap_and_dense_descriptors(images)
        heat = heat[..., :H, :W]
        desc = desc[..., :H, :W]
        B = heat.shape[0]
        keep = nms2d(heat, (window_size, window_size), mask_only=True)
        keep = keep & (heat > score_threshold)
        scores = jnp.where(keep, heat, -jnp.inf)[:, 0].reshape(B, -1)
        vals, idx = jax.lax.top_k(scores, n)
        xs = (idx % W).astype(heat.dtype)
        ys = (idx // W).astype(heat.dtype)
        kp = jnp.stack([xs, ys], -1)
        D = desc.shape[1]
        dflat = desc.reshape(B, D, -1)
        dsel = jnp.take_along_axis(
            dflat, jnp.broadcast_to(idx[:, None, :], (B, D, n)), axis=2)
        dsel = jnp.swapaxes(dsel, 1, 2)
        dsel = dsel / jnp.maximum(
            jnp.linalg.norm(dsel, axis=-1, keepdims=True), 1e-8)
        valid = jnp.isfinite(vals)
        return DISKFeatures(kp, dsel, jnp.where(valid, vals, 0.0), valid)
