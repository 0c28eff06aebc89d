"""Deployment-export mixins mirroring the reference's ONNX mixins
(reference: core/mixin/onnx.py:38,167,291) on the StableHLO path —
`to_onnx` becomes `export` (serialize a jitted call via jax.export)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax

__all__ = ["ONNXExportMixin", "ONNXRuntimeMixin", "ONNXMixin"]


class ONNXExportMixin:
    """Adds .export(path, example_args) to any callable model
    (reference: ONNXExportMixin.to_onnx, core/mixin/onnx.py:38)."""

    def export(self, path: str, example_args: Sequence[jax.Array]):
        from ..utils.export import save_exported
        save_exported(path, self.__call__, example_args)
        return path

    # reference-name alias; emits a StableHLO artifact, not an onnx proto
    def to_onnx(self, onnx_name: Optional[str] = None, *args,
                example_args: Sequence[jax.Array] = (), **kwargs):
        name = onnx_name or f"{type(self).__name__}.stablehlo"
        return self.export(name, example_args)


class ONNXRuntimeMixin:
    """Execution mixin (reference: core/mixin/onnx.py:167 creates ort
    sessions; here artifacts are natively executable)."""

    def create_session(self, artifact_path: str):
        from ..utils.export import load_exported
        self._session = load_exported(artifact_path)
        return self._session

    def get_session(self):
        return getattr(self, "_session", None)

    # execution-provider selectors are meaningless for a TPU-native
    # executable; kept for source compatibility
    def as_cpu(self, **kwargs):
        return self

    def as_cuda(self, device_id: int = 0, **kwargs):
        return self

    def as_tensorrt(self, device_id: int = 0, **kwargs):
        return self

    def as_openvino(self, device_type: str = "GPU", **kwargs):
        return self


class ONNXMixin:
    """Proto-level load/combine ops (reference: core/mixin/onnx.py:291);
    StableHLO artifacts load via ONNXLoader and compose positionally."""

    def _load_op(self, arg):
        from ..onnx import ONNXModule
        return ONNXModule(arg)

    def _combine(self, *ops):
        from ..onnx import ONNXSequential
        return ONNXSequential(*ops)
