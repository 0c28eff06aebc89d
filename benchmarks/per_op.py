#!/usr/bin/env python
"""Per-op microbenchmark sweep (reference analogue:
benchmarks/augmentation/per_op.py — the reference's eager-vs-compiled
per-op profiling harness).

Sweeps a broad slice of the op layer (filters / color / enhance /
morphology / warp / feature responses) at the reference's regime
(batch 32, 256x256) and prints one line per op with throughput and
effective HBM bandwidth, plus a JSON summary. Pass `--profile DIR` to
capture a jax.profiler trace of the whole sweep for XProf.

Usage: python benchmarks/per_op.py [--profile /tmp/trace] [--csv]
"""

import argparse
import json
import math
import time

import jax
import jax.numpy as jnp

from kornia_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def _timed(fn, img, reps=7):
    """Chained single-call timing with a forced 4-byte value fetch
    (block_until_ready can acknowledge at enqueue through the axon
    tunnel — see bench.py)."""
    import numpy as np
    out = fn(img)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(fn(img))[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _bench(fn, img):
    """Per-call time with the RPC round-trip subtracted (measured on a
    no-op fetch)."""
    t = _timed(fn, img)
    rtt = _timed(jax.jit(lambda x: x[:1, :1, :1, :1] * 1.0), img)
    return max(t - rtt, 1e-9)


def build_ops():
    import kornia_tpu as kt
    from kornia_tpu import morphology
    from kornia_tpu.feature.responses import gftt_response, harris_response
    from kornia_tpu.ops import (adjust_brightness, adjust_contrast,
                                adjust_gamma, adjust_hue, adjust_saturation,
                                bilateral_blur, box_blur, canny, dilation,
                                equalize, erosion, gaussian_blur2d,
                                grayscale_to_rgb, hflip, median_blur,
                                motion_blur, normalize_min_max, posterize,
                                resize, rgb_to_grayscale, rgb_to_hsv,
                                rgb_to_lab, rotate, sharpness, sobel,
                                solarize, spatial_gradient, vflip,
                                warp_affine, warp_perspective)

    H = W = 256
    M3 = jnp.asarray([[0.98, 0.05, 3.0], [-0.04, 1.01, -2.0],
                      [1e-5, -2e-5, 1.0]], jnp.float32)

    ops = {
        "hflip": jax.jit(hflip),
        "vflip": jax.jit(vflip),
        "rgb_to_grayscale": jax.jit(rgb_to_grayscale),
        "rgb_to_hsv": jax.jit(rgb_to_hsv),
        "rgb_to_lab": jax.jit(rgb_to_lab),
        "adjust_brightness": jax.jit(lambda x: adjust_brightness(x, 0.2)),
        "adjust_contrast": jax.jit(lambda x: adjust_contrast(x, 1.1)),
        "adjust_saturation": jax.jit(lambda x: adjust_saturation(x, 1.3)),
        "adjust_hue": jax.jit(lambda x: adjust_hue(x, 0.3)),
        "adjust_gamma": jax.jit(lambda x: adjust_gamma(x, 1.5)),
        "solarize": jax.jit(lambda x: solarize(x, 0.6)),
        "posterize": jax.jit(lambda x: posterize(x, 4)),
        "sharpness": jax.jit(lambda x: sharpness(x, 0.7)),
        "equalize": jax.jit(equalize),
        "normalize_min_max": jax.jit(normalize_min_max),
        "gaussian_blur_3x3": jax.jit(lambda x: gaussian_blur2d(x, 3, 0.8)),
        "gaussian_blur_9x9": jax.jit(lambda x: gaussian_blur2d(x, 9, 1.8)),
        "box_blur_5": jax.jit(lambda x: box_blur(x, 5)),
        "median_blur_3": jax.jit(lambda x: median_blur(x, 3)),
        "bilateral_blur_5": jax.jit(
            lambda x: bilateral_blur(x, 5, 0.1, (1.5, 1.5))),
        "motion_blur_7": jax.jit(lambda x: motion_blur(x, 7, 45.0, 0.0)),
        "sobel": jax.jit(sobel),
        "spatial_gradient": jax.jit(spatial_gradient),
        "canny": jax.jit(lambda x: canny(rgb_to_grayscale(x))[0]),
        "dilation_5": jax.jit(lambda x: dilation(x, jnp.ones((5, 5)))),
        "erosion_5": jax.jit(lambda x: erosion(x, jnp.ones((5, 5)))),
        "resize_half": jax.jit(lambda x: resize(x, (H // 2, W // 2))),
        "resize_half_aa": jax.jit(
            lambda x: resize(x, (H // 2, W // 2), antialias=True)),
        "rotate_30": jax.jit(lambda x: rotate(x, jnp.asarray(30.0))),
        "warp_affine": jax.jit(
            lambda x: warp_affine(
                x, jnp.broadcast_to(M3[:2][None], (x.shape[0], 2, 3)),
                (H, W))),
        "warp_perspective": jax.jit(
            lambda x: warp_perspective(
                x, jnp.broadcast_to(M3[None], (x.shape[0], 3, 3)), (H, W))),
        "harris_response": jax.jit(
            lambda x: harris_response(rgb_to_grayscale(x))),
        "gftt_response": jax.jit(
            lambda x: gftt_response(rgb_to_grayscale(x))),
    }
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace to this dir")
    ap.add_argument("--csv", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    B, C, H, W = args.batch, 3, 256, 256
    img = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W))
    ops = build_ops()

    rows = []
    ctx = None
    if args.profile:
        from kornia_tpu.utils.debug import trace
        ctx = trace(args.profile)
        ctx.__enter__()
    try:
        for name, fn in ops.items():
            dt = _bench(fn, img)
            tput = B / dt
            gbps = B * C * H * W * 4 * 2 / dt / 1e9
            rows.append((name, dt * 1e3, tput, gbps))
            if args.csv:
                print(f"{name},{dt * 1e3:.4f},{tput:.0f},{gbps:.1f}")
            else:
                print(f"{name:24s} {dt * 1e3:8.3f} ms  {tput:10.0f} img/s"
                      f"  {gbps:7.1f} GB/s", flush=True)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)

    geomean = math.exp(sum(math.log(r[2]) for r in rows) / len(rows))
    print(json.dumps({"metric": "per_op_geomean_throughput",
                      "value": round(geomean, 1), "unit": "img/s",
                      "ops": len(rows)}))


if __name__ == "__main__":
    main()
