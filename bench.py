#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: the reference's own per-op augmentation benchmark regime
(batch 32, 256x256, GPU — benchmarks/augmentation/README.md:77-86).
vs_baseline = geometric-mean speedup of our TPU throughput over the
reference's best published GPU numbers (kornia compiled where available,
eager otherwise; BASELINE.md).
"""

import json
import math
import time

import jax
import jax.numpy as jnp

from kornia_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # persist TPU executables across runs


def _bench(fn, *args, warmup=3, iters=30):
    """Median of per-call times — robust to the remote-tunnel latency
    spikes of the axon backend (dispatch occasionally blocks ~100ms for
    reasons unrelated to device compute)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    from kornia_tpu.ops import (adjust_brightness, gaussian_blur2d, hflip,
                                resize, rgb_to_grayscale, vflip)

    B, C, H, W = 32, 3, 256, 256
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, C, H, W), dtype=jnp.float32)

    # reference numbers: kornia on Jetson Orin GPU, batch 32 256x256
    # (BASELINE.md; compiled column where it exists, else eager)
    ops = {
        "HorizontalFlip": (jax.jit(hflip), 11458.0),
        "VerticalFlip": (jax.jit(vflip), 10599.0),
        "Resize_half": (jax.jit(lambda x: resize(x, (128, 128), antialias=True)),
                        None),  # reference kornia entry is ✗ on GPU
        "GaussianBlur": (jax.jit(lambda x: gaussian_blur2d(x, 3, 0.8)), 1042.0),
        "Brightness": (jax.jit(lambda x: adjust_brightness(x, 1.1)), 12284.0),
        "Grayscale": (jax.jit(rgb_to_grayscale), 24777.0),
    }

    speedups = []
    throughputs = {}
    for name, (fn, ref) in ops.items():
        dt = _bench(fn, img)
        imgs_per_s = B / dt
        throughputs[name] = imgs_per_s
        if ref:
            speedups.append(imgs_per_s / ref)

    geomean_tp = math.exp(sum(math.log(v) for v in throughputs.values())
                          / len(throughputs))
    geomean_speedup = math.exp(sum(math.log(s) for s in speedups)
                               / len(speedups))

    print(json.dumps({
        "metric": "aug_per_op_geomean_throughput_b32_256",
        "value": round(geomean_tp, 1),
        "unit": "img/s",
        "vs_baseline": round(geomean_speedup, 2),
    }))


if __name__ == "__main__":
    main()
