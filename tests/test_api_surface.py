"""API-surface parity: every public name a reference (kornia) user can
import from ``kornia.<subpackage>`` must exist in ``kornia_tpu.<subpackage>``
(SURVEY.md §2 component inventory, enforced mechanically).

Names are compared with ``dir()`` on the reference module, filtered to
exclude private names, submodules, and the reference's accidental typing
re-exports. A small documented skip-list covers torch/onnx-runtime-specific
surfaces that have an explicit TPU-native replacement elsewhere.
"""

import importlib
import sys
import types

import pytest

sys.path.append("/root/reference")
sys.modules.setdefault("kornia_rs", types.ModuleType("kornia_rs"))

torch = pytest.importorskip("torch")

# accidental re-exports in the reference (typing / stdlib leaks)
_TYPING_LEAKS = {
    "Optional", "Tuple", "List", "Union", "Dict", "Any", "Callable",
    "annotations", "TYPE_CHECKING", "Sequence", "Iterable", "cast",
    "torch", "nn", "Tensor", "F", "math", "np", "warnings", "wraps",
    "dataclass", "field", "Enum", "IntEnum", "partial", "deepcopy",
    "ClassVar", "NamedTuple", "TypeVar", "Generic", "abstractmethod",
    "ABC", "datetime", "Literal", "Iterator", "Mapping", "Set",
}

# reference surfaces that are deliberately NOT mirrored 1:1, with reasons
_SKIP = {
    # onnxruntime execution wrappers — our export path is StableHLO
    # (kornia_tpu.utils.export); no ORT in a TPU-native stack
    "feature.OnnxLightGlue",
    "contrib.EdgeDetectorBuilder",
    "contrib.RTDETRDetectorBuilder",
    "contrib.RRDBNetBuilder",
    "contrib.SmallSRBuilder",
    "contrib.TinyViT",  # lives in kornia_tpu.models (backbone, not contrib)
    # torch.compile / torchscript knobs with no JAX counterpart
    "utils.is_mps_tensor_safe",
    "utils.torch_meshgrid",
    "utils.torch_version",
    "utils.map_location_to_cpu",
    "utils.get_cuda_device_if_available",
    "utils.get_mps_device_if_available",
    "utils.is_autocast_enabled",
    "utils.dataclass_to_dict", "utils.dict_to_dataclass",
    # torch dtype helpers (JAX: jnp dtypes directly)
    "image.ImageLoadType",  # it lives in kornia_tpu.io (same as reference's io)
}


def _public_names(mod):
    out = []
    for n in dir(mod):
        if n.startswith("_") or n in _TYPING_LEAKS:
            continue
        obj = getattr(mod, n)
        if isinstance(obj, types.ModuleType):
            continue
        out.append(n)
    return out


SUBPACKAGES = [
    "color", "filters", "enhance", "morphology", "geometry", "feature",
    "losses", "metrics", "contrib", "utils", "image", "io",
    "augmentation", "tracking", "core", "onnx", "transpiler", "models",
    "sensors",
]


@pytest.mark.parametrize("sub", SUBPACKAGES)
def test_subpackage_surface(sub):
    ref = importlib.import_module(f"kornia.{sub}")
    mine = importlib.import_module(f"kornia_tpu.{sub}")
    top = importlib.import_module("kornia_tpu")
    missing = []
    for name in _public_names(ref):
        if f"{sub}.{name}" in _SKIP:
            continue
        if not (hasattr(mine, name) or hasattr(top, name)):
            missing.append(name)
    assert not missing, (
        f"kornia.{sub} exposes {len(missing)} names absent from "
        f"kornia_tpu.{sub}: {missing}")


def test_top_level_surface():
    import kornia
    import kornia_tpu
    skip = {"augmentation_list", "config", "kornia_config"} | _TYPING_LEAKS
    missing = []
    for name in _public_names(kornia):
        if name in skip:
            continue
        if not hasattr(kornia_tpu, name):
            missing.append(name)
    assert not missing, f"top-level missing: {missing}"
