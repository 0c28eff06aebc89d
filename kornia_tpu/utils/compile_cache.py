"""Persistent XLA compilation cache helper.

Large multi-octave pipelines (ScaleSpaceDetector / SIFTFeature) compile a
big fused module (~45 s on a TPU v5e the first time). JAX can persist
compiled executables to disk so every later process with the same program
+ compiler version loads in milliseconds. This wires that up with safe
defaults; calling it twice is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache"]

_enabled = False


def enable_compilation_cache(path: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> bool:
    """Enable JAX's persistent compilation cache at `path`.

    Default path: $KORNIA_TPU_CACHE or ~/.cache/kornia_tpu/xla. Only
    programs whose compile takes >= `min_compile_time_secs` are persisted
    (tiny executables aren't worth the disk round-trip). Returns True if
    the cache is active.
    """
    global _enabled
    if _enabled:
        return True
    if path is None:
        from ..config import kornia_tpu_config
        path = kornia_tpu_config.compile_cache_dir
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
        # cache regardless of backend (CPU runs in tests benefit too)
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "all")
        except Exception:
            pass  # older jax: flag absent; directory cache still works
        _enabled = True
    except Exception:
        return False
    return True
