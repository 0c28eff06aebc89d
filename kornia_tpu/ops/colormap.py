"""Colormaps (reference: kornia/color/colormap.py:320 + _colormap_data.py).

Compact analytic + tabulated maps; `apply_colormap` interpolates any
(N, 3) table (ops/color.py).
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .color import apply_colormap

__all__ = ["ColorMapType", "ColorMap", "ApplyColorMap"]


# 16-anchor viridis (matplotlib data, subsampled)
_VIRIDIS = np.array([
    [0.267004, 0.004874, 0.329415], [0.282623, 0.140926, 0.457517],
    [0.253935, 0.265254, 0.529983], [0.206756, 0.371758, 0.553117],
    [0.163625, 0.471133, 0.558148], [0.127568, 0.566949, 0.550556],
    [0.134692, 0.658636, 0.517649], [0.266941, 0.748751, 0.440573],
    [0.477504, 0.821444, 0.318195], [0.741388, 0.873449, 0.149561],
    [0.993248, 0.906157, 0.143936], [0.993248, 0.906157, 0.143936],
    [0.993248, 0.906157, 0.143936], [0.993248, 0.906157, 0.143936],
    [0.993248, 0.906157, 0.143936], [0.993248, 0.906157, 0.143936],
], np.float32)[:11]


def _jet(n: int = 64) -> np.ndarray:
    t = np.linspace(0, 1, n)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return np.stack([r, g, b], -1).astype(np.float32)


def _gray(n: int = 64) -> np.ndarray:
    t = np.linspace(0, 1, n).astype(np.float32)
    return np.stack([t, t, t], -1)


def _autumn(n: int = 64) -> np.ndarray:
    t = np.linspace(0, 1, n).astype(np.float32)
    return np.stack([np.ones_like(t), t, np.zeros_like(t)], -1)


def _hot(n: int = 64) -> np.ndarray:
    t = np.linspace(0, 1, n)
    r = np.clip(3 * t, 0, 1)
    g = np.clip(3 * t - 1, 0, 1)
    b = np.clip(3 * t - 2, 0, 1)
    return np.stack([r, g, b], -1).astype(np.float32)


class ColorMapType(enum.Enum):
    viridis = "viridis"
    jet = "jet"
    gray = "gray"
    autumn = "autumn"
    hot = "hot"


_TABLES = {
    ColorMapType.viridis: _VIRIDIS,
    ColorMapType.jet: _jet(),
    ColorMapType.gray: _gray(),
    ColorMapType.autumn: _autumn(),
    ColorMapType.hot: _hot(),
}


class ColorMap:
    """(reference: colormap.py ColorMap)."""

    def __init__(self, base: ColorMapType | str = ColorMapType.viridis,
                 num_colors: int = 64):
        if isinstance(base, str):
            base = ColorMapType(base)
        table = _TABLES[base]
        # resample to num_colors
        t = np.linspace(0, 1, num_colors)
        src = np.linspace(0, 1, table.shape[0])
        out = np.stack([np.interp(t, src, table[:, i]) for i in range(3)], -1)
        self.colors = jnp.asarray(out, jnp.float32)

    def __len__(self):
        return self.colors.shape[0]

    def __call__(self, gray: jax.Array) -> jax.Array:
        return apply_colormap(gray, self.colors)


class ApplyColorMap:
    def __init__(self, colormap: ColorMap):
        self.colormap = colormap

    def __call__(self, gray: jax.Array) -> jax.Array:
        return self.colormap(gray)
