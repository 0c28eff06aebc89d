"""Contrib operators (reference: kornia/contrib/, 3.6k LoC):
connected components, convolutional distance transform, diamond-square
plasma fractals, tensor patch extract/combine, histogram matching,
batched k-means.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.check import check, check_shape
from ..core.dtype import as_float

__all__ = [
    "connected_components",
    "distance_transform",
    "diamond_square",
    "extract_tensor_patches",
    "combine_tensor_patches",
    "histogram_matching",
    "KMeans",
    "kmeans",
]


def connected_components(image: jax.Array, num_iterations: int = 100
                         ) -> jax.Array:
    """Iterative label propagation on a binary (B, 1, H, W) image
    (reference: contrib/connected_components.py:22). Fixed trip count
    (`lax.scan`), labels are flat indices + 1 of each component's max."""
    check_shape(image, ["B", "1", "H", "W"], "image")
    image = as_float(image)
    B, _, H, W = image.shape
    mask = image > 0.5
    init = (jnp.arange(H * W, dtype=jnp.float32).reshape(1, 1, H, W) + 1.0)
    init = jnp.broadcast_to(init, image.shape) * mask

    def body(labels, _):
        pooled = lax.reduce_window(
            labels, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
        return jnp.where(mask, pooled, 0.0), None

    labels, _ = lax.scan(body, init, None, length=num_iterations)
    return labels


def distance_transform(image: jax.Array, kernel_size: int = 3,
                       h: float = 0.35) -> jax.Array:
    """Convolutional (soft) distance transform
    (reference: contrib/distance_transform.py:93). image: (B, 1, H, W),
    zeros = background; returns approximate distance to nearest nonzero."""
    image = as_float(image)
    B, C, H, W = image.shape
    n_iters = -(-max(H, W) // (kernel_size // 2))
    grid = jnp.stack(jnp.meshgrid(
        jnp.arange(kernel_size, dtype=image.dtype),
        jnp.arange(kernel_size, dtype=image.dtype), indexing="ij"), -1)
    center = (kernel_size - 1) / 2.0
    kernel = jnp.exp(-jnp.linalg.norm(grid - center, axis=-1) / h)[None]
    from ..ops.filters import filter2d

    def body(carry, i):
        out, boundary = carry
        signal = filter2d(boundary, kernel, border_type="constant")
        bound = 1e4
        cdt = -h * jnp.log(jnp.maximum(signal, 1e-12))
        cdt = jnp.where(signal > 1e-6, cdt, bound)
        offset = i * (kernel_size // 2)
        cdt = jnp.maximum(cdt, 0.0)
        update = (cdt + offset) * (out == 0) * (cdt < bound)
        new_out = out + update
        new_boundary = jnp.where(signal > 1e-6, jnp.ones_like(boundary), boundary)
        return (new_out, new_boundary), None

    out0 = jnp.zeros_like(image)
    (out, _), _ = lax.scan(body, (out0, image), jnp.arange(n_iters))
    return out * (image <= 0.5)


def diamond_square(
    output_size: Tuple[int, int, int, int],
    roughness: float = 0.7,
    random_scale: float = 1.0,
    key: Optional[jax.Array] = None,
    normalize_range: Optional[Tuple[float, float]] = (0.0, 1.0),
) -> jax.Array:
    """Plasma fractal terrain (reference: contrib/diamond_square.py),
    via successive upsample + scaled noise (equivalent spectral shaping,
    static shapes)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    B, C, H, W = output_size
    import math
    levels = max(1, math.ceil(math.log2(max(H, W) - 1))) if max(H, W) > 1 else 1
    size = 2
    img = jax.random.uniform(key, (B, C, 2, 2)) * random_scale
    scale = random_scale
    from ..ops.warp import resize
    for lv in range(levels):
        key, sub = jax.random.split(key)
        size = min(2 * size - 1, max(H, W))
        img = resize(img, (size, size), "bilinear", align_corners=True)
        scale = scale * roughness
        img = img + (jax.random.uniform(sub, img.shape) - 0.5) * scale
    img = resize(img, (H, W), "bilinear", align_corners=True)
    if normalize_range is not None:
        lo, hi = normalize_range
        mn = jnp.min(img, axis=(-2, -1), keepdims=True)
        mx = jnp.max(img, axis=(-2, -1), keepdims=True)
        img = (img - mn) / jnp.maximum(mx - mn, 1e-8) * (hi - lo) + lo
    return img


def extract_tensor_patches(
    input: jax.Array,
    window_size,
    stride=1,
    padding: int = 0,
) -> jax.Array:
    """(B, C, H, W) → (B, L, C, h, w) sliding patches
    (reference: contrib/extract_patches.py:120)."""
    x = as_float(input)
    wh, ww = (window_size, window_size) if isinstance(window_size, int) else window_size
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    if padding:
        x = jnp.pad(x, [(0, 0), (0, 0), (padding, padding), (padding, padding)])
    B, C, H, W = x.shape
    ny = (H - wh) // sh + 1
    nx = (W - ww) // sw + 1
    # gather rows then cols via strided reshape (no data-dependent shapes)
    idx_y = (jnp.arange(ny) * sh)[:, None] + jnp.arange(wh)[None, :]  # (ny, wh)
    idx_x = (jnp.arange(nx) * sw)[:, None] + jnp.arange(ww)[None, :]
    patches = x[:, :, idx_y][:, :, :, :, idx_x]  # (B, C, ny, wh, nx, ww)
    patches = patches.transpose(0, 2, 4, 1, 3, 5)  # (B, ny, nx, C, wh, ww)
    return patches.reshape(B, ny * nx, C, wh, ww)


def combine_tensor_patches(
    patches: jax.Array,
    original_size,
    window_size,
    stride,
    allow_auto_unpadding: bool = False,
) -> jax.Array:
    """Inverse of extract_tensor_patches with overlap averaging
    (reference: contrib/extract_patches.py:221)."""
    H, W = (original_size, original_size) if isinstance(original_size, int) else original_size
    wh, ww = (window_size, window_size) if isinstance(window_size, int) else window_size
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    B, L, C, _, _ = patches.shape
    ny = (H - wh) // sh + 1
    nx = (W - ww) // sw + 1
    out = jnp.zeros((B, C, H, W), patches.dtype)
    cnt = jnp.zeros((1, 1, H, W), patches.dtype)
    p = patches.reshape(B, ny, nx, C, wh, ww)
    for iy in range(ny):
        for ix in range(nx):
            out = lax.dynamic_update_slice(
                out,
                lax.dynamic_slice(out, (0, 0, iy * sh, ix * sw), (B, C, wh, ww))
                + p[:, iy, ix],
                (0, 0, iy * sh, ix * sw),
            )
            cnt = lax.dynamic_update_slice(
                cnt,
                lax.dynamic_slice(cnt, (0, 0, iy * sh, ix * sw), (1, 1, wh, ww))
                + 1.0,
                (0, 0, iy * sh, ix * sw),
            )
    return out / jnp.maximum(cnt, 1.0)


def histogram_matching(source: jax.Array, template: jax.Array) -> jax.Array:
    """Match source's sorted values to template's quantiles
    (reference: contrib/histogram_matching.py). Exact-sort formulation:
    differentiable a.e., O(N log N)."""
    source = as_float(source)
    template = as_float(template)
    shape = source.shape
    src = source.reshape(-1)
    tmpl = jnp.sort(template.reshape(-1))
    order = jnp.argsort(src)
    ranks = jnp.argsort(order)
    # map rank i/N to template quantile
    n_src = src.shape[0]
    n_tmp = tmpl.shape[0]
    pos = ranks.astype(source.dtype) * (n_tmp - 1) / max(n_src - 1, 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_tmp - 1)
    w = pos - lo
    matched = tmpl[lo] * (1 - w) + tmpl[hi] * w
    return matched.reshape(shape)


def kmeans(x: jax.Array, num_clusters: int, key: Optional[jax.Array] = None,
           num_iters: int = 20) -> Tuple[jax.Array, jax.Array]:
    """Batched k-means (reference: contrib/kmeans.py:28). x: (N, D) →
    (centers (K, D), assignments (N,)). Lloyd iterations via one-hot
    matmuls (MXU-shaped)."""
    x = as_float(x)
    if key is None:
        key = jax.random.PRNGKey(0)
    N, D = x.shape
    init_idx = jax.random.choice(key, N, (num_clusters,), replace=False)
    centers0 = x[init_idx]

    def body(centers, _):
        d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=-1)
        oh = jax.nn.one_hot(assign, num_clusters, dtype=x.dtype)
        counts = jnp.sum(oh, axis=0)
        sums = oh.T @ x
        new_centers = sums / jnp.maximum(counts[:, None], 1.0)
        new_centers = jnp.where(counts[:, None] > 0, new_centers, centers)
        return new_centers, None

    centers, _ = lax.scan(body, centers0, None, length=num_iters)
    d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
    return centers, jnp.argmin(d2, axis=-1)


class KMeans:
    """Stateful wrapper mirroring the reference API (contrib/kmeans.py:28)."""

    def __init__(self, num_clusters: int, tolerance: float = 1e-4,
                 max_iterations: int = 20, seed: int = 0):
        self.num_clusters = num_clusters
        self.max_iterations = max_iterations
        self.seed = seed
        self.cluster_centers: Optional[jax.Array] = None

    def fit(self, x: jax.Array) -> None:
        self.cluster_centers, self._assignments = kmeans(
            x, self.num_clusters, jax.random.PRNGKey(self.seed),
            self.max_iterations)

    def predict(self, x: jax.Array) -> jax.Array:
        d2 = jnp.sum((x[:, None, :] - self.cluster_centers[None]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=-1)


def compute_padding(original_size, window_size, stride=None):
    """(top, bottom, left, right) padding so extract→combine round-trips
    (reference: contrib/extract_patches.py:52)."""
    def pair(v):
        return (v, v) if isinstance(v, int) else tuple(v)
    oh, ow = pair(original_size)
    wh, ww = pair(window_size)
    sh, sw = pair(stride if stride is not None else window_size)
    rv = (oh - wh) % sh
    rh = (ow - ww) % sw
    vp = sh - rv if rv else 0
    hp = sw - rh if rh else 0
    top, left = vp // 2, hp // 2
    return (top, vp - top, left, hp - left)


def interp(x: jax.Array, xp: jax.Array, fp: jax.Array) -> jax.Array:
    """1D linear interpolation, numpy.interp semantics
    (reference: contrib/histogram_matching.py:64)."""
    return jnp.interp(as_float(x), as_float(xp), as_float(fp))


class Lambda:
    """Wrap any callable as a module (reference:
    contrib/lambda_module.py:24)."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    forward = __call__


__all__ += ["compute_padding", "interp", "Lambda"]
