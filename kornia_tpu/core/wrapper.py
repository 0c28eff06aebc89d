"""Transparent array proxy (reference: core/tensor_wrapper.py:61
TensorWrapper via __torch_function__; here operator forwarding + pytree
registration so wrapped values flow through jit/vmap/grad)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["TensorWrapper", "wrap", "unwrap"]


@jax.tree_util.register_pytree_node_class
class TensorWrapper:
    """Wraps a jax.Array; arithmetic/indexing delegate to the data and
    rewrap, so subclasses (Vector2/Vector3 analogues) stay typed."""

    def __init__(self, data):
        self._data = jnp.asarray(data)

    # pytree protocol
    def tree_flatten(self):
        return (self._data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def data(self):
        return self._data

    def unwrap(self):
        return self._data

    @property
    def shape(self):
        return self._data.shape

    @property
    def dtype(self):
        return self._data.dtype

    @property
    def ndim(self):
        return self._data.ndim

    def __len__(self):
        return len(self._data)

    def __iter__(self):
        return iter(self._data)

    def __repr__(self):
        return f"{type(self).__name__}({self._data})"

    def __jax_array__(self):
        return self._data

    def __array__(self, dtype=None):
        import numpy as np
        return np.asarray(self._data, dtype)

    def _coerce(self, other):
        return other._data if isinstance(other, TensorWrapper) else other

    def _rewrap(self, v):
        return type(self)(v)

    def __getitem__(self, idx):
        return self._rewrap(self._data[idx])

    def __neg__(self):
        return self._rewrap(-self._data)

    def __abs__(self):
        return self._rewrap(jnp.abs(self._data))


def _binop(name, fn):
    def op(self, other):
        return self._rewrap(fn(self._data, self._coerce(other)))

    def rop(self, other):
        return self._rewrap(fn(self._coerce(other), self._data))

    setattr(TensorWrapper, f"__{name}__", op)
    setattr(TensorWrapper, f"__r{name}__", rop)


for _n, _f in [("add", jnp.add), ("sub", jnp.subtract),
               ("mul", jnp.multiply), ("truediv", jnp.divide),
               ("pow", jnp.power), ("matmul", jnp.matmul)]:
    _binop(_n, _f)
del _n, _f

for _n, _f in [("eq", jnp.equal), ("ne", jnp.not_equal),
               ("lt", jnp.less), ("le", jnp.less_equal),
               ("gt", jnp.greater), ("ge", jnp.greater_equal)]:
    def _cmp(self, other, fn=_f):
        return fn(self._data, self._coerce(other))
    setattr(TensorWrapper, f"__{_n}__", _cmp)
del _n, _f


def wrap(data, cls=TensorWrapper):
    return cls(data)


def unwrap(x):
    return x.unwrap() if isinstance(x, TensorWrapper) else x
