"""Central configuration object (reference: kornia/config.py:67
KorniaConfig / kornia_config).

TPU-native differences: instead of the reference's hub-download knobs,
the config centralizes the things that matter on this stack — the XLA
compilation-cache directory, the default storage dtype for augmentation
pipelines, trace-time check toggling, and the on-disk directories used
by the weight-port tooling (`kornia_tpu.weights`) and StableHLO export.

Every field is initialized from an environment variable so deployments
can configure without code changes; mutating `kornia_tpu_config` at
runtime is equally supported (it is a plain mutable dataclass, read at
use sites, not captured in jitted code).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

__all__ = ["KorniaTPUConfig", "kornia_tpu_config"]


@dataclass
class KorniaTPUConfig:
    """Global knobs, env-overridable.

    Attributes:
        output_dir: default directory for artifacts (exports, renders).
        models_dir: where ported checkpoints are staged / looked up by
            `kornia_tpu.weights` (reference role: hub_models_dir).
        export_dir: StableHLO export directory (reference role:
            hub_onnx_dir).
        compile_cache_dir: persistent XLA compilation cache
            (utils.enable_compilation_cache).
        checks_enabled: trace-time shape/type checks (core/check.py);
            flip off for zero-overhead tracing of validated pipelines.
        storage_dtype: augmentation/container storage dtype name
            ("float32" or "bfloat16" — bf16 halves HBM traffic on TPU).
    """

    output_dir: str = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_OUTPUT_DIR", "kornia_tpu_outputs"))
    models_dir: str = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_MODELS_DIR",
            os.path.join(".kornia_tpu_hub", "models")))
    export_dir: str = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_EXPORT_DIR",
            os.path.join(".kornia_tpu_hub", "stablehlo")))
    compile_cache_dir: str = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "kornia_tpu",
                         "xla")))
    checks_enabled: bool = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_CHECK_DISABLED", "0") not in ("1", "true"))
    storage_dtype: str = field(
        default_factory=lambda: os.environ.get(
            "KORNIA_TPU_STORAGE_DTYPE", "float32"))


kornia_tpu_config = KorniaTPUConfig()
