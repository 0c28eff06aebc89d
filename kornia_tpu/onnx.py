"""kornia-layout: ``kornia_tpu.onnx`` mirrors ``kornia.onnx``'s deployment
API (ONNXModule/ONNXSequential/ONNXLoader, onnx/module.py:29,
onnx/sequential.py:29, onnx/utils.py:37) on the TPU-native export format:
**StableHLO artifacts via jax.export** instead of ONNX protos + onnxruntime.

A saved artifact is a version-stable serialized computation runnable from
any JAX runtime and convertible to TF/TFLite through the StableHLO
ecosystem — the role ONNX plays for the reference.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax

from .utils.export import ExportedOp, export_op, load_exported, save_exported

__all__ = [
    "ONNXModule", "ONNXSequential", "ONNXLoader", "load", "add_metadata",
    "io_name_conversion", "ExportedOp", "export_op", "save_exported",
    "load_exported",
]

_METADATA: dict = {}


class ONNXModule:
    """Executable deployment artifact (reference: onnx/module.py:29
    ONNXModule wraps an ort session; here a deserialized StableHLO
    executable)."""

    def __init__(self, arg):
        if isinstance(arg, (str, os.PathLike)):
            self.op = load_exported(os.fspath(arg))
        elif isinstance(arg, ExportedOp):
            self.op = arg
        elif callable(arg):
            self.op = arg
        else:
            raise TypeError(f"cannot wrap {type(arg)}")

    def __call__(self, *args):
        return self.op(*args)

    forward = __call__

    @classmethod
    def from_callable(cls, fn: Callable,
                      example_args: Sequence[jax.Array]) -> "ONNXModule":
        import io
        from jax import export as jax_export
        data = export_op(fn, example_args)
        return cls(ExportedOp(jax_export.deserialize(bytearray(data))))


class ONNXSequential:
    """Chain deployment artifacts / callables; the output of stage i feeds
    stage i+1 (reference: onnx/sequential.py:29 — there a proto-level graph
    combine; composition is natural for executables)."""

    def __init__(self, *ops, io_maps=None):
        self.ops = [op if isinstance(op, ONNXModule) else ONNXModule(op)
                    for op in ops]

    def __call__(self, *args):
        out = args
        for op in self.ops:
            out = op(*out) if isinstance(out, tuple) else op(out)
        return out

    forward = __call__

    def export(self, fn_args: Sequence[jax.Array], path: str) -> None:
        """Fuse the whole chain into ONE artifact and save it."""
        def chained(*args):
            out = args
            for op in self.ops:
                out = op(*out) if isinstance(out, tuple) else op(out)
            return out
        save_exported(path, chained, fn_args)


class ONNXLoader:
    """Artifact cache/loader (reference: onnx/utils.py:37 downloads from
    the HF hub; offline here, reads a local cache directory)."""

    def __init__(self, cache_dir: Optional[str] = None):
        self.cache_dir = cache_dir or os.path.join(
            os.path.expanduser("~"), ".kornia_tpu", "exported")

    def load_model(self, name: str) -> ONNXModule:
        path = name if os.path.exists(name) else os.path.join(
            self.cache_dir, name)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no exported artifact at {path}; save one with "
                "kornia_tpu.onnx.save_exported (no network egress here)")
        return ONNXModule(path)


def load(name: str) -> ONNXModule:
    """(reference: onnx/utils.py load)."""
    return ONNXLoader().load_model(name)


def add_metadata(artifact_path: str, additional_metadata=()) -> dict:
    """Attach key/value metadata to an artifact — kept in a sidecar since
    StableHLO artifacts are opaque bytes (reference: onnx/utils.py
    add_metadata writes onnx proto metadata_props)."""
    import json
    meta_path = str(artifact_path) + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    meta.update(dict(additional_metadata))
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def io_name_conversion(artifact: Any, io_name_mapping: dict) -> Any:
    """ONNX graphs need io-name rewiring to compose (reference:
    onnx/utils.py io_name_conversion); StableHLO artifacts compose
    positionally, so this is the identity."""
    return artifact
