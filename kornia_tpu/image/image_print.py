"""Terminal image rendering (reference: kornia/image/image_print.py —
image_to_string / print_image): 24-bit ANSI half-block art.
"""

from __future__ import annotations

import numpy as np

__all__ = ["image_to_string", "print_image"]


def image_to_string(image, max_width: int = 80) -> str:
    """image: (C, H, W) float [0,1] or uint8 → ANSI string using ▀ blocks
    (two rows per character cell)."""
    a = np.asarray(image)
    if a.ndim == 2:
        a = a[None]
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    if a.shape[0] == 1:
        a = np.repeat(a, 3, axis=0)
    C, H, W = a.shape
    scale = max(1, int(np.ceil(W / max_width)))
    a = a[:, :: scale, :: scale]
    C, H, W = a.shape
    if H % 2:
        a = a[:, :-1]
        H -= 1
    lines = []
    for y in range(0, H, 2):
        row = []
        for x in range(W):
            tr, tg, tb = a[:, y, x]
            br, bg, bb = a[:, y + 1, x]
            row.append(f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(row) + "\x1b[0m")
    return "\n".join(lines)


def print_image(image, max_width: int = 80) -> None:
    print(image_to_string(image, max_width))
