"""Kornia-compatible class wrappers over functional ops.

The reference exposes most operations twice: a functional (``gaussian_blur2d``)
and an ``nn.Module`` class (``GaussianBlur2d``) whose constructor takes the
functional's trailing configuration arguments. In a JAX stack there is no
module system to inherit from — the class API is a thin frozen-config callable,
which is exactly what :func:`fn_module` manufactures.

Reference pattern: e.g. kornia/filters/gaussian.py:GaussianBlur2d wraps
kornia/filters/gaussian.py:gaussian_blur2d.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["fn_module"]


def fn_module(fn: Callable, name: str, doc: str | None = None):
    """Build a kornia-style callable class around functional ``fn``.

    Constructor arguments are the functional's trailing (configuration)
    arguments; ``__call__`` takes the positional (array) arguments and
    applies ``fn(*inputs, *cfg_args, **cfg_kwargs)``.
    """

    class _Mod:
        def __init__(self, *args, **kwargs):
            self._args = args
            self._kwargs = kwargs

        def __call__(self, *inputs, **call_kwargs):
            return fn(*inputs, *self._args,
                      **{**self._kwargs, **call_kwargs})

        def __repr__(self):
            cfg = ", ".join([*map(repr, self._args),
                             *(f"{k}={v!r}" for k, v in
                               self._kwargs.items())])
            return f"{name}({cfg})"

    _Mod.__name__ = _Mod.__qualname__ = name
    _Mod.__doc__ = doc or (
        f"Class API over ``{fn.__module__}.{fn.__name__}`` "
        f"(kornia-compatible module wrapper).")
    return _Mod


class ImageModuleMixIn:
    """Auto-convert numpy/PIL inputs to jax arrays and offer
    save/show/to_numpy on outputs (reference: core/mixin/image_module.py:31).
    """

    _output_image = None

    def _to_array(self, x):
        import jax.numpy as jnp
        import numpy as np
        if isinstance(x, (list, tuple)):
            return type(x)(self._to_array(v) for v in x)
        if hasattr(x, "__array__") or isinstance(x, np.ndarray):
            arr = jnp.asarray(np.asarray(x))
            if arr.dtype == jnp.uint8:
                arr = arr.astype(jnp.float32) / 255.0
            if arr.ndim == 3 and arr.shape[-1] in (1, 3, 4):
                arr = jnp.moveaxis(arr, -1, 0)
            return arr
        return x

    def to_numpy(self):
        import numpy as np
        return np.asarray(self._output_image)

    def save(self, name: str = "kornia_out.jpg", n_row=None):
        from ..io import write_image
        import jax.numpy as jnp
        out = self._output_image
        if out is None:
            raise RuntimeError("run the module before save()")
        if out.ndim == 4:
            from ..image.utils import make_grid
            out = make_grid(out, n_row)
        write_image(name, jnp.clip(out, 0, 1))

    def show(self):  # pragma: no cover - needs a display
        from ..image.image_print import print_image
        print_image(self._output_image)


class ImageModule(ImageModuleMixIn):
    """Callable whose __call__ converts inputs and records the output for
    save()/show() (reference: core/module.py:28 ImageModule)."""

    disable_features: bool = False

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        if not self.disable_features:
            args = tuple(self._to_array(a) for a in args)
        out = self.forward(*args, **kwargs)
        if not self.disable_features:
            self._output_image = out
        return out


class ImageSequential(ImageModuleMixIn):
    """Sequential over callables with ImageModule conveniences
    (reference: core/module.py:102 ImageSequential)."""

    disable_features: bool = False

    def __init__(self, *fns):
        self.fns = fns

    def __call__(self, x):
        if not self.disable_features:
            x = self._to_array(x)
        for fn in self.fns:
            x = fn(x)
        if not self.disable_features:
            self._output_image = x
        return x

    forward = __call__


__all__ += ["ImageModule", "ImageModuleMixIn", "ImageSequential"]
