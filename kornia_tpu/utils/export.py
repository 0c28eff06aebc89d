"""Model/op export via jax.export (StableHLO) — the deployment analogue of
the reference's ONNX subsystem (kornia/onnx/, core/mixin/onnx.py): a
serialized, version-stable artifact executable from any JAX runtime (and
convertible to TF/TFLite via the StableHLO ecosystem).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["ExportedOp", "export_op", "save_exported", "load_exported"]


@dataclasses.dataclass
class ExportedOp:
    """Wraps a deserialized StableHLO artifact (analogue of ONNXModule,
    onnx/module.py:29)."""

    exported: Any

    def __call__(self, *args):
        return self.exported.call(*args)

    @property
    def in_avals(self):
        return self.exported.in_avals


def export_op(fn: Callable, example_args: Sequence[jax.Array]) -> bytes:
    """Trace + serialize `fn` for the given arg shapes → bytes."""
    specs = tuple(
        jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))
        for a in example_args
    )
    exp = jax_export.export(jax.jit(fn))(*specs)
    return exp.serialize()


def save_exported(path: str, fn: Callable,
                  example_args: Sequence[jax.Array]) -> None:
    with open(path, "wb") as f:
        f.write(export_op(fn, example_args))


def load_exported(path: str) -> ExportedOp:
    with open(path, "rb") as f:
        data = f.read()
    return ExportedOp(jax_export.deserialize(bytearray(data)))
