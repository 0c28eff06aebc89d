"""Point-cloud PLY io (reference: kornia/utils/pointcloud_io.py /
geometry pointcloud.py:107 — load/save_pointcloud_ply)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_pointcloud_ply", "load_pointcloud_ply"]


def save_pointcloud_ply(filename: str, pointcloud: jax.Array) -> None:
    """pointcloud: (N, 3) or (H, W, 3); non-finite points dropped."""
    pts = np.asarray(pointcloud).reshape(-1, 3)
    mask = np.isfinite(pts).all(axis=1)
    pts = pts[mask]
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {pts.shape[0]}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def load_pointcloud_ply(filename: str) -> jax.Array:
    """→ (N, 3) array. Supports the ascii PLY written above."""
    with open(filename) as f:
        lines = f.readlines()
    n = 0
    start = 0
    for i, line in enumerate(lines):
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        if line.strip() == "end_header":
            start = i + 1
            break
    pts = np.loadtxt(lines[start : start + n], dtype=np.float32)
    return jnp.asarray(pts.reshape(-1, 3))
