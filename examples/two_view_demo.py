#!/usr/bin/env python
"""Two-view relative pose on a synthetic calibrated pair.

Run: python examples/two_view_demo.py            (uses the default device)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kornia_tpu.ops.filters import gaussian_blur2d
from kornia_tpu.ops.warp import warp_perspective
from kornia_tpu.slam import two_view_pose


def main():
    key = jax.random.PRNGKey(7)
    size = 128
    img0 = gaussian_blur2d(jax.random.uniform(key, (1, 1, size, size)), 3, 1.0)
    M = jnp.eye(3).at[0, 2].set(-4.0)[None]
    img1 = warp_perspective(img0, M, (size, size))
    K = jnp.array([[0.8 * size, 0.0, size / 2],
                   [0.0, 0.8 * size, size / 2], [0.0, 0.0, 1.0]])
    res = two_view_pose(img0, img1, K, num_features=384)
    print("inliers:", int(res.num_inliers))
    print("R:\n", np.asarray(res.R).round(4))
    print("t direction:", np.asarray(res.t[:, 0]).round(4))


if __name__ == "__main__":
    main()
