"""kornia_tpu — a TPU-native differentiable vision and SLAM/SfM framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
kornia/kornia (see SURVEY.md for the blueprint), extended with a
distributed bundle-adjustment / pose-graph backend over `jax.sharding`
device meshes.

Layer map (mirrors SURVEY.md §1, all jit/vmap/grad-closed):
  core      — checks, dtype policy, robust f32 linalg, grids, RNG
  ops       — filters / color / enhance / morphology / warp / resize
  geometry  — conversions, Lie groups, cameras, homography/epipolar, RANSAC
  feature   — detectors, LAFs, descriptors, matchers
  slam      — bundle adjustment, pose graph, visual odometry (new)
  parallel  — mesh runtime, sharding helpers, collectives
  augmentation — probabilistic image augmentation pipelines
  losses / metrics — reconstruction & task losses, quality metrics
"""

__version__ = "0.1.0"

from . import (
    augmentation,
    color,
    contrib,
    core,
    enhance,
    feature,
    filters,
    geometry,
    image,
    io,
    losses,
    metrics,
    models,
    morphology,
    ops,
    parallel,
    sensors,
    slam,
    tracking,
    utils,
)

__all__ = [
    "augmentation", "color", "contrib", "core", "enhance", "feature",
    "filters", "geometry", "image", "io", "losses", "metrics", "models",
    "morphology", "ops", "parallel", "sensors", "slam", "tracking", "utils",
    "__version__",
]
