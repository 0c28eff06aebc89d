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

from .config import KorniaTPUConfig, kornia_tpu_config
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
    "KorniaTPUConfig", "kornia_tpu_config", "__version__",
]

# --- reference top-level surface (kornia/__init__.py re-exports) -------------

import jax.numpy as _jnp

# reference: kornia/constants.py:32 — pi as a tensor constant
pi = _jnp.asarray(3.14159265358979323846)


def eye_like(n: int, input, shared_memory: bool = False):
    """Batched identity matching input's batch size/dtype
    (reference: core/ops.py:23)."""
    return _jnp.broadcast_to(_jnp.eye(n, dtype=input.dtype),
                             (input.shape[0], n, n))


def vec_like(n: int, tensor, shared_memory: bool = False):
    """Batched (n, 1) zero vectors (reference: core/ops.py:50)."""
    return _jnp.zeros((tensor.shape[0], n, 1), tensor.dtype)


def xla_is_available() -> bool:
    """Everything here runs through XLA (reference probes torch_xla,
    core/utils.py:80)."""
    return True


def is_autocast_enabled(recheck: bool = False) -> bool:
    """JAX has no autocast context; dtype policy is explicit
    (reference: core/utils.py:335)."""
    return False


def _device_of_kind(kind: str):
    import jax as _jax
    for d in _jax.devices():
        if d.platform == kind:
            return d
    return None


def get_cuda_device_if_available(index: int = 0):
    """TPU-native analogue: the first accelerator device, else None
    (reference: core/utils.py:33)."""
    import jax as _jax
    for d in _jax.devices():
        if d.platform != "cpu":
            return d
    return None


def get_mps_device_if_available():
    """No MPS on this stack (reference: core/utils.py:59)."""
    return None


def get_cuda_or_mps_device_if_available(index: int = 0):
    return get_cuda_device_if_available(index)


def to_jax(arg=None, **kwargs):
    """The reference transpiles itself to JAX via ivy
    (transpiler/transpiler.py:26); this build IS native JAX, so the
    transpile is the identity."""
    import kornia_tpu as _k
    return _k if arg is None else arg


def to_numpy(arg):
    """jax.Array / pytree → numpy (reference: transpiler to_numpy)."""
    import numpy as _np
    import jax as _jax
    return _jax.tree_util.tree_map(_np.asarray, arg)


def to_tensorflow(arg=None):
    """jax function/module → tensorflow via jax2tf
    (reference: transpiler to_tensorflow)."""
    from jax.experimental import jax2tf
    if callable(arg):
        return jax2tf.convert(arg)
    raise ValueError("to_tensorflow expects a jittable callable")


from .utils import (  # noqa: F401,E402
    create_meshgrid,
    create_meshgrid3d,
    deprecated,
    draw_convex_polygon,
    draw_line,
    draw_point2d,
    draw_rectangle,
    image_to_string,
    image_to_tensor,
    load_pointcloud_ply,
    one_hot,
    print_image,
    save_pointcloud_ply,
    tensor_to_image,
)

__all__ += [
    "pi", "eye_like", "vec_like", "xla_is_available", "is_autocast_enabled",
    "get_cuda_device_if_available", "get_mps_device_if_available",
    "get_cuda_or_mps_device_if_available", "to_jax", "to_numpy",
    "to_tensorflow", "create_meshgrid", "create_meshgrid3d", "deprecated",
    "draw_convex_polygon", "draw_line", "draw_point2d", "draw_rectangle",
    "image_to_string", "image_to_tensor", "load_pointcloud_ply", "one_hot",
    "print_image", "save_pointcloud_ply", "tensor_to_image",
]
