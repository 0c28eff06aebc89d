#!/usr/bin/env python
"""A/B probe for the fused separable blur kernel variants on TPU.

Timing by fetch-forced batch scaling (see bench.py): device time of one
batch-B application = (T(B*mult) - T(B)) / (mult - 1), min over reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.utils import enable_compilation_cache
from kornia_tpu.ops.pallas_kernels import fused_separable_blur2d
from kornia_tpu.ops.filters import filter2d_separable, get_gaussian_kernel1d

enable_compilation_cache()

MULT = 16


def _timed(fn, img, reps=11):
    f = jax.jit(fn)
    out = f(img)
    np.asarray(out.reshape(-1)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(img).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(fn, img):
    imgN = jnp.concatenate([img * (1.0 - 0.001 * i) for i in range(MULT)], 0)
    t1 = _timed(fn, img)
    tN = _timed(fn, imgN)
    return max((tN - t1) / (MULT - 1), 1e-9)


def main():
    B, C, H, W = 32, 3, 256, 256
    for k in (5,):
        key = jax.random.PRNGKey(0)
        img = jax.random.uniform(key, (B, C, H, W), dtype=jnp.float32)
        k1 = get_gaussian_kernel1d(k, 0.3 * ((k - 1) * 0.5 - 1) + 0.8)
        nbytes = B * C * H * W * 4 * 2  # read + write
        # measured 2026-08 on v5e (fetch-forced batch scaling):
        #   pallas_mm2 414.9 GB/s | xla_mm2 126.5 | (removed variants:
        #   shift 76.9, transpose 125.6, matmul 61.2). All Pallas paths
        #   are full f32; the XLA two-pass lowers f32 convs to bf16 MXU
        #   multiplies (3.7e-3 max err) and its marginal-time measurement
        #   collapses under batch scaling (XLA re-fuses across the batch).
        variants = {
            "xla_two_pass": lambda x: filter2d_separable(x, k1, k1, "reflect"),
            "pallas_mm2": lambda x: fused_separable_blur2d(
                x, k1, k1, "reflect", variant="mm2"),
            "xla_mm2": lambda x: fused_separable_blur2d(
                x, k1, k1, "reflect", variant="xla_mm2"),
        }
        ref = None
        for name, fn in variants.items():
            try:
                out = jax.jit(fn)(img)
                if ref is None:
                    ref = np.asarray(out)
                    err = 0.0
                else:
                    err = float(np.abs(np.asarray(out) - ref).max())
                dt = bench(fn, img)
                print(f"k={k} {name:18s} {dt * 1e6:9.1f} us  "
                      f"{nbytes / dt / 1e9:7.1f} GB/s  maxerr={err:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"k={k} {name:18s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
