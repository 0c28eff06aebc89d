"""Exact ray-traced renderer for textured planar scenes.

Ground-truth sequence generation for the SLAM/VO north star: real TUM/ETH3D
data cannot be staged in this environment (no egress), so accuracy numbers
are produced on rendered sequences with EXACT 6-DoF ground truth, true
parallax (multi-depth planar geometry — the same structure class as the
reference's epipolar test scenes, kornia/geometry/epipolar/scene.py:64),
and photometrically rich fractal textures.

The renderer is a tiny analytic ray tracer over textured rectangles:
per-pixel ray ∩ plane in closed form, nearest-hit z-buffering, bilinear
texture lookup — fully vectorized, jittable, and differentiable. It also
returns exact per-pixel depth, usable as ground truth for depth ops.

No reference counterpart (kornia has no renderer); built for evaluation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PlaneScene", "render_scene", "make_room_scene",
           "walk_trajectory", "orbit_trajectory", "render_sequence"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PlaneScene:
    """A set of P textured rectangles.

    origins:  (P, 3) rectangle corner (world)
    edge_u:   (P, 3) edge spanning texture-u (full side length)
    edge_v:   (P, 3) edge spanning texture-v
    textures: (P, Ht, Wt) grayscale albedo in [0, 1]
    """

    origins: jax.Array
    edge_u: jax.Array
    edge_v: jax.Array
    textures: jax.Array

    def tree_flatten(self):
        return (self.origins, self.edge_u, self.edge_v, self.textures), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def render_scene(scene: PlaneScene, K: jax.Array, T_w2c: jax.Array,
                 height: int, width: int,
                 background: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """Render one view. Returns (image (1, 1, H, W), z-depth (H, W)).

    T_w2c is the (4, 4) world→camera transform; pixels follow the usual
    +x right / +y down / +z forward pinhole convention.
    """
    R = T_w2c[:3, :3]
    t = T_w2c[:3, 3]
    cam_center = -R.T @ t  # (3,)

    # per-pixel ray directions in world coords
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=K.dtype),
                          jnp.arange(width, dtype=K.dtype), indexing="ij")
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)  # (H, W, 3)
    Kinv = jnp.linalg.inv(K)
    d_cam = pix @ Kinv.T  # (H, W, 3), z-component == 1
    d_world = d_cam @ R  # R^T @ d per pixel

    o = scene.origins  # (P, 3)
    eu = scene.edge_u
    ev = scene.edge_v
    n = jnp.cross(eu, ev)  # (P, 3) plane normal (unnormalized)

    # ray ∩ plane: s = dot(o - C, n) / dot(d, n)   (s = distance along ray
    # in units of |d_world|; z-depth = s because d_cam.z == 1)
    denom = jnp.einsum("hwk,pk->hwp", d_world, n)
    num = jnp.einsum("pk,pk->p", o - cam_center[None], n)
    s = num[None, None, :] / jnp.where(jnp.abs(denom) < 1e-12,
                                       jnp.inf, denom)  # (H, W, P)
    hit = cam_center[None, None, None] + s[..., None] * d_world[:, :, None]
    rel = hit - o[None, None]  # (H, W, P, 3)
    # rectangle coords (a, b) via the dual basis (handles non-orthogonal
    # edges): solve [eu·eu eu·ev; ev·eu ev·ev] [a b] = [rel·eu, rel·ev]
    g11 = jnp.einsum("pk,pk->p", eu, eu)
    g12 = jnp.einsum("pk,pk->p", eu, ev)
    g22 = jnp.einsum("pk,pk->p", ev, ev)
    det = g11 * g22 - g12 * g12
    ru = jnp.einsum("hwpk,pk->hwp", rel, eu)
    rv = jnp.einsum("hwpk,pk->hwp", rel, ev)
    a = (g22 * ru - g12 * rv) / det
    b = (g11 * rv - g12 * ru) / det

    valid = (s > 1e-4) & (a >= 0.0) & (a <= 1.0) & (b >= 0.0) & (b <= 1.0)
    depth_all = jnp.where(valid, s, jnp.inf)
    nearest = jnp.argmin(depth_all, axis=-1)  # (H, W)
    depth = jnp.take_along_axis(depth_all, nearest[..., None], -1)[..., 0]
    any_hit = jnp.isfinite(depth)

    # bilinear texture sample on the winning plane
    Ht, Wt = scene.textures.shape[-2:]
    a_w = jnp.take_along_axis(a, nearest[..., None], -1)[..., 0]
    b_w = jnp.take_along_axis(b, nearest[..., None], -1)[..., 0]
    u = jnp.clip(a_w, 0.0, 1.0) * (Wt - 1)
    v = jnp.clip(b_w, 0.0, 1.0) * (Ht - 1)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, Wt - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, Ht - 2)
    fu = u - u0
    fv = v - v0
    def sample(dy, dx):
        return scene.textures[nearest, v0 + dy, u0 + dx]

    c00 = sample(0, 0)
    c01 = sample(0, 1)
    c10 = sample(1, 0)
    c11 = sample(1, 1)
    color = ((1 - fv) * ((1 - fu) * c00 + fu * c01)
             + fv * ((1 - fu) * c10 + fu * c11))
    img = jnp.where(any_hit, color, background)
    depth = jnp.where(any_hit, depth, 0.0)
    return img[None, None], depth


def _fractal_texture(key: jax.Array, size: int, contrast: float = 1.0
                     ) -> jax.Array:
    """Multi-octave fractal texture in [0, 1] with rich corner content."""
    from ..contrib.ops import diamond_square
    k1, k2 = jax.random.split(key)
    base = diamond_square((1, 1, size, size), roughness=0.6, key=k1)[0, 0]
    # superpose a blocky layer: hard edges → strong, localizable corners
    cells = 8
    blocks = jax.random.uniform(k2, (cells, cells))
    reps = size // cells + 1
    blocky = jnp.kron(blocks, jnp.ones((reps, reps)))[:size, :size]
    tex = 0.6 * base + 0.4 * blocky
    tex = 0.5 + contrast * (tex - jnp.mean(tex))
    return jnp.clip(tex, 0.02, 0.98)


def make_room_scene(key: Optional[jax.Array] = None, tex_size: int = 256,
                    room: Tuple[float, float, float] = (6.0, 4.0, 10.0),
                    n_boxes: int = 2) -> PlaneScene:
    """A textured room (4 walls, floor, ceiling) with free-standing textured
    boxes providing multi-depth parallax. Room spans x∈[-W/2, W/2],
    y∈[-H/2, H/2] (y down), z∈[0, D]; cameras travel along +z."""
    if key is None:
        key = jax.random.PRNGKey(7)
    W, H, D = room
    planes: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def rect(origin, eu, ev):
        planes.append((np.asarray(origin, np.float32),
                       np.asarray(eu, np.float32),
                       np.asarray(ev, np.float32)))

    # walls: left (x=-W/2), right (x=+W/2), far (z=D), floor (y=H/2), ceil
    rect([-W / 2, -H / 2, 0], [0, 0, D], [0, H, 0])       # left
    rect([W / 2, -H / 2, 0], [0, 0, D], [0, H, 0])        # right
    rect([-W / 2, -H / 2, D], [W, 0, 0], [0, H, 0])       # far wall
    rect([-W / 2, H / 2, 0], [W, 0, 0], [0, 0, D])        # floor
    rect([-W / 2, -H / 2, 0], [W, 0, 0], [0, 0, D])       # ceiling
    # free-standing boxes (front + side faces)
    rng = np.random.default_rng(3)
    for i in range(n_boxes):
        cx = float(rng.uniform(-W / 4, W / 4))
        cz = float(rng.uniform(0.35 * D, 0.75 * D))
        w = float(rng.uniform(0.6, 1.2))
        h = float(rng.uniform(0.8, 1.6))
        rect([cx - w / 2, H / 2 - h, cz], [w, 0, 0], [0, h, 0])  # front face
        rect([cx - w / 2, H / 2 - h, cz], [0, 0, w], [0, h, 0])  # left face
        rect([cx + w / 2, H / 2 - h, cz], [0, 0, w], [0, h, 0])  # right face

    P = len(planes)
    keys = jax.random.split(key, P)
    textures = jnp.stack([_fractal_texture(keys[i], tex_size)
                          for i in range(P)])
    return PlaneScene(
        origins=jnp.asarray(np.stack([p[0] for p in planes])),
        edge_u=jnp.asarray(np.stack([p[1] for p in planes])),
        edge_v=jnp.asarray(np.stack([p[2] for p in planes])),
        textures=textures)


def _look_rotation(yaw: float, pitch: float = 0.0) -> np.ndarray:
    """world→camera rotation for a camera yawed/pitched from +z."""
    cy, sy = math.cos(yaw), math.sin(yaw)
    cp, sp = math.cos(pitch), math.sin(pitch)
    R_yaw = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]])
    R_pitch = np.array([[1, 0, 0], [0, cp, sp], [0, -sp, cp]])
    return (R_pitch @ R_yaw).astype(np.float32)


def walk_trajectory(n_frames: int, depth: float = 10.0,
                    lateral: float = 0.8, yaw_amp: float = 0.12,
                    pitch_amp: float = 0.05) -> np.ndarray:
    """TUM-style handheld forward walk: advance along +z with sinusoidal
    lateral sway and gentle yaw/pitch. Returns (N, 4, 4) world→camera."""
    Ts = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        pos = np.array([lateral * math.sin(2.5 * math.pi * s),
                        0.25 * math.sin(1.5 * math.pi * s),
                        0.15 * depth + 0.55 * depth * s], np.float32)
        R = _look_rotation(yaw_amp * math.sin(3.0 * math.pi * s),
                           pitch_amp * math.sin(2.0 * math.pi * s))
        t = (-R @ pos).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return np.stack(Ts)


def orbit_trajectory(n_frames: int, radius: float = 2.0,
                     center_z: float = 6.0, sweep: float = 0.9
                     ) -> np.ndarray:
    """ETH3D-style inward-looking arc around a fixation point."""
    Ts = []
    for i in range(n_frames):
        ang = (-sweep / 2 + sweep * i / max(n_frames - 1, 1))
        pos = np.array([radius * math.sin(ang), 0.0,
                        center_z - radius * math.cos(ang)], np.float32)
        R = _look_rotation(-ang)
        t = (-R @ pos).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return np.stack(Ts)


def render_sequence(scene: PlaneScene, K: jax.Array, trajectory: np.ndarray,
                    height: int, width: int
                    ) -> Tuple[List[jax.Array], List[jax.Array]]:
    """Render every pose in (N, 4, 4). Returns (frames, depths); frames are
    (1, 1, H, W) in [0, 1]."""
    rend = jax.jit(lambda T: render_scene(scene, K, T, height, width))
    frames, depths = [], []
    for T in trajectory:
        img, depth = rend(jnp.asarray(T))
        frames.append(img)
        depths.append(depth)
    return frames, depths


def loop_trajectory(n_frames: int, rx: float = 1.6, rz: float = 3.2,
                    center_z: float = 5.0, sway: float = 0.08
                    ) -> np.ndarray:
    """Closed circuit inside the room: the camera walks an ellipse in the
    x-z plane, heading along the path tangent (full 360° yaw sweep), and
    returns to its start pose — the canonical loop-closure trajectory
    (frame N-1 revisits frame 0's view). Returns (N, 4, 4) world→camera."""
    Ts = []
    for i in range(n_frames):
        ang = 2.0 * math.pi * i / max(n_frames - 1, 1)
        pos = np.array([rx * math.sin(ang),
                        sway * math.sin(3.0 * ang),
                        center_z - rz * math.cos(ang)], np.float32)
        tx, tz = rx * math.cos(ang), rz * math.sin(ang)
        yaw = math.atan2(tx, tz)
        R = _look_rotation(yaw, 0.04 * math.sin(2.0 * ang))
        t = (-R @ pos).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return np.stack(Ts)


def degrade_sequence(frames: List[jax.Array], key: jax.Array,
                     exposure_amp: float = 0.25, noise_sigma: float = 0.01,
                     blur_frac: float = 0.3, blur_kernel: int = 5
                     ) -> List[jax.Array]:
    """Photometric nuisance model for rendered sequences: smooth exposure
    drift (random-walk log-gain), per-frame Gaussian sensor noise, and
    directional motion blur on a random subset of frames — the effects a
    perfect-photometry render cannot exercise (TUM-style degradations)."""
    from ..ops.filters import motion_blur

    n = len(frames)
    k_gain, k_noise, k_blur, k_ang = jax.random.split(key, 4)
    steps = jax.random.normal(k_gain, (n,)) * (exposure_amp / max(n ** 0.5, 1))
    log_gain = jnp.cumsum(steps)
    log_gain = log_gain - jnp.mean(log_gain)
    gains = jnp.exp(jnp.clip(log_gain, -exposure_amp, exposure_amp))
    blur_mask = jax.random.uniform(k_blur, (n,)) < blur_frac
    angles = jax.random.uniform(k_ang, (n,), minval=0.0, maxval=180.0)
    out = []
    for i, f in enumerate(frames):
        g = gains[i]
        img = f * g
        if bool(blur_mask[i]):
            img = motion_blur(img, blur_kernel, angles[i][None])
        noise = jax.random.normal(jax.random.fold_in(k_noise, i), f.shape)
        img = jnp.clip(img + noise_sigma * noise, 0.0, 1.0)
        out.append(img)
    return out
