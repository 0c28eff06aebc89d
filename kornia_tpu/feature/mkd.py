"""Multiple Kernel local Descriptor (MKD) — exact architecture
(reference: kornia/feature/mkd.py, "Understanding and Improving Kernel Local
Descriptors", Mukundan et al. 2019).

TPU notes: every embedding is a fixed precomputed tensor contraction —
the whole descriptor is one gaussian blur + gradients + two einsums, so it
fuses cleanly under jit. The reference downloads trained whitening models
from torch.hub (mkd.py:36-39 urls); offline here, so ``whitening_model`` is
an explicit constructor argument ported from a torch checkpoint via
:func:`load_whitening_from_torch` (same format: dict[training_set][algo]
with 'mean'/'eigvecs'/'eigvals').
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtype import as_float
from ..core.grid import create_meshgrid
from ..geometry.conversions import cart2pol
from ..ops.filters import gaussian_blur2d, spatial_gradient

__all__ = [
    "MKDGradients", "VonMisesKernel", "EmbedGradients",
    "ExplicitSpacialEncoding", "Whitening", "MKDDescriptor", "SimpleKD",
    "get_grid_dict", "get_kron_order", "spatial_kernel_embedding",
    "load_whitening_from_torch",
]

_SQRT2 = 1.4142135623730951
COEFFS: Dict[str, List[float]] = {
    "xy": [0.38214156, 0.48090413],
    "rhophi": [0.14343168, 0.268285, 0.21979234],
    "theta": [0.14343168, 0.268285, 0.21979234, 0.15838885],
}


def get_grid_dict(patch_size: int = 32) -> Dict[str, jax.Array]:
    """Cartesian + polar parametrizations of the patch grid
    (reference: mkd.py:42)."""
    kgrid = create_meshgrid(patch_size, patch_size,
                            normalized_coordinates=True)
    x = kgrid[0, :, :, 0]
    y = kgrid[0, :, :, 1]
    rho, phi = cart2pol(x, y)
    return {"x": x, "y": y, "rho": rho, "phi": phi}


def get_kron_order(d1: int, d2: int) -> jax.Array:
    """(d1*d2, 2) kronecker index table (reference: mkd.py:52)."""
    g1, g2 = jnp.meshgrid(jnp.arange(d1), jnp.arange(d2), indexing="ij")
    return jnp.stack([g1, g2], axis=2).reshape(-1, 2)


class MKDGradients:
    """(B, 1, H, W) patches → (B, 2, H, W) [magnitude, orientation]
    (reference: mkd.py:59)."""

    eps = 1e-8

    def __call__(self, x: jax.Array) -> jax.Array:
        x = as_float(x)
        grads = -spatial_gradient(x, "diff", 1, normalized=False)
        gx = grads[:, :, 0]
        gy = grads[:, :, 1]
        mags, oris = cart2pol(gx, gy, self.eps)
        return jnp.concatenate([mags, oris], axis=1)


class VonMisesKernel:
    """Feature map of the Von Mises kernel: weights * [1, cos kx, sin kx]
    (reference: mkd.py:115)."""

    def __init__(self, patch_size: int, coeffs):
        self.patch_size = patch_size
        b = jnp.asarray(coeffs, jnp.float32)
        n = len(coeffs) - 1
        self.n = n
        self.d = 2 * n + 1
        self.frange = (jnp.arange(n, dtype=jnp.float32) + 1).reshape(-1, 1, 1)
        w = jnp.concatenate([jnp.sqrt(b), jnp.sqrt(b[1:])])
        self.weights = w.reshape(-1, 1, 1)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = as_float(x)
        emb0 = jnp.ones_like(x)
        fr = self.frange * x
        emb = jnp.concatenate([emb0, jnp.cos(fr), jnp.sin(fr)], axis=1)
        return self.weights * emb


class EmbedGradients:
    """Von Mises embedding of orientations weighted by sqrt magnitudes
    (reference: mkd.py:195)."""

    eps = 1e-8

    def __init__(self, patch_size: int = 32, relative: bool = False):
        self.patch_size = patch_size
        self.relative = relative
        self.kernel = VonMisesKernel(patch_size, COEFFS["theta"])
        kgrid = create_meshgrid(patch_size, patch_size,
                                normalized_coordinates=True)
        _, self.phi = cart2pol(kgrid[..., 0], kgrid[..., 1])

    def __call__(self, grads: jax.Array) -> jax.Array:
        mags = grads[:, :1]
        oris = grads[:, 1:]
        if self.relative:
            oris = oris - self.phi
        return self.kernel(oris) * jnp.sqrt(mags + self.eps)


def spatial_kernel_embedding(kernel_type: str,
                             grids: Dict[str, jax.Array]) -> jax.Array:
    """Precomputed position embedding for cart/polar parametrization
    (reference: mkd.py:262)."""
    factors = {"phi": 1.0, "rho": jnp.pi / _SQRT2, "x": jnp.pi / 2,
               "y": jnp.pi / 2}
    if kernel_type == "cart":
        coeffs_, params_ = "xy", ["x", "y"]
    else:
        coeffs_, params_ = "rhophi", ["phi", "rho"]
    patch_size = next(iter(grids.values())).shape[-1]
    normed = {k: (v * factors[k])[None, None] for k, v in grids.items()}
    vm = VonMisesKernel(patch_size, COEFFS[coeffs_])
    emb_a = vm(normed[params_[0]])[0]
    emb_b = vm(normed[params_[1]])[0]
    kron = get_kron_order(vm.d, vm.d)
    return emb_a[kron[:, 0]] * emb_b[kron[:, 1]]


class ExplicitSpacialEncoding:
    """Kronecker combination of feature and position embeddings, summed
    over the patch (reference: mkd.py:293)."""

    def __init__(self, kernel_type: str = "polar", fmap_size: int = 32,
                 in_dims: int = 7, do_gmask: bool = True,
                 do_l2: bool = True):
        if kernel_type not in ("polar", "cart"):
            raise NotImplementedError(
                f"{kernel_type} is not valid, use polar or cart")
        self.kernel_type = kernel_type
        self.fmap_size = fmap_size
        self.in_dims = in_dims
        self.do_gmask = do_gmask
        self.do_l2 = do_l2
        self.grid = get_grid_dict(fmap_size)
        emb = spatial_kernel_embedding(kernel_type, self.grid)
        if do_gmask:
            norm_rho = self.grid["rho"] / self.grid["rho"].max()
            emb = emb * jnp.exp(-(norm_rho**2))
        self.emb = emb[None]  # (1, d_emb, H, W)
        self.d_emb = emb.shape[0]
        self.out_dims = self.odims = in_dims * self.d_emb
        kron = get_kron_order(in_dims, self.d_emb)
        self.emb2 = self.emb[:, kron[:, 1]]
        self.idx1 = kron[:, 0]

    def __call__(self, x: jax.Array) -> jax.Array:
        out = jnp.sum(x[:, self.idx1] * self.emb2, axis=(2, 3))
        if self.do_l2:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out


class Whitening:
    """Supervised (lw) / unsupervised (pca[ws|wt]) descriptor whitening
    (reference: mkd.py:409)."""

    def __init__(self, xform: str, whitening_model, in_dims: int,
                 output_dims: int = 128, keval: int = 40, t: float = 0.7):
        self.xform = xform
        self.in_dims = in_dims
        self.keval = keval
        self.t = t
        self.pval = 1.0
        output_dims = min(output_dims, in_dims)
        self.output_dims = output_dims
        self.mean = jnp.zeros(in_dims)
        self.evecs = jnp.eye(in_dims)[:, :output_dims]
        self.evals = jnp.ones(in_dims)[:output_dims]
        if whitening_model is not None:
            algo = "lw" if xform == "lw" else "pca"
            m = whitening_model[algo]
            self.mean = jnp.asarray(m["mean"])
            self.evecs = jnp.asarray(m["eigvecs"])[:, :output_dims]
            self.evals = jnp.asarray(m["eigvals"])[:output_dims]
            if xform == "pca":
                self.pval = 0.5
            elif xform == "pcaws":
                alpha = self.evals[keval]
                evals = (1 - alpha) * self.evals + alpha
                self.evecs = self.evecs @ jnp.diag(evals**-0.5)
            elif xform == "pcawt":
                self.evecs = self.evecs @ jnp.diag(self.evals**(-0.5 * t))

    def __call__(self, x: jax.Array) -> jax.Array:
        x = as_float(x) - self.mean
        x = x @ self.evecs
        x = jnp.sign(x) * jnp.abs(x)**self.pval
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)


class MKDDescriptor:
    """Full MKD descriptor (reference: mkd.py:540). ``whitening_model`` must
    be supplied explicitly (dict[algo] of mean/eigvecs/eigvals) — offline
    analogue of the reference's torch.hub download."""

    def __init__(self, patch_size: int = 32, kernel_type: str = "concat",
                 whitening: Optional[str] = "pcawt",
                 training_set: str = "liberty", output_dims: int = 128,
                 whitening_model=None):
        self.patch_size = patch_size
        self.kernel_type = kernel_type
        self.whitening = whitening if whitening_model is not None else None
        self.training_set = training_set
        self.sigma = 1.4 * (patch_size / 64)
        self.gradients = MKDGradients()
        params = (["polar", "cart"] if kernel_type == "concat"
                  else [kernel_type])
        self.parametrizations = params
        relative = {"polar": True, "cart": False}
        self.feats = {}
        self.odims = 0
        for p in params:
            ge = EmbedGradients(patch_size, relative=relative[p])
            se = ExplicitSpacialEncoding(p, patch_size,
                                         in_dims=ge.kernel.d)
            self.feats[p] = (ge, se)
            self.odims += se.odims
        self.output_dims = min(output_dims, self.odims)
        if self.whitening is not None:
            self.whitening_layer = Whitening(
                whitening, whitening_model, in_dims=self.odims,
                output_dims=self.output_dims)
            self.odims = self.output_dims

    def __call__(self, patches: jax.Array) -> jax.Array:
        g = gaussian_blur2d(as_float(patches), (5, 5),
                            (self.sigma, self.sigma), "replicate")
        g = self.gradients(g)
        feats = []
        for p in self.parametrizations:
            ge, se = self.feats[p]
            feats.append(se(ge(g)))
        y = jnp.concatenate(feats, axis=1)
        y = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        if self.whitening is not None:
            y = self.whitening_layer(y)
        return y

    forward = __call__


class SimpleKD:
    """Simplified MKD: one parametrization + whitening
    (reference: mkd.py:676)."""

    def __init__(self, patch_size: int = 32, kernel_type: str = "polar",
                 whitening: str = "pcawt", training_set: str = "liberty",
                 output_dims: int = 128, whitening_model=None):
        self.mkd = MKDDescriptor(patch_size, kernel_type, whitening,
                                 training_set, output_dims, whitening_model)

    def __call__(self, patches: jax.Array) -> jax.Array:
        return self.mkd(patches)

    forward = __call__


def load_whitening_from_torch(state) -> Dict:
    """Convert a torch mkd whitening checkpoint (dict[training_set][algo]
    of torch tensors) to jnp (reference download format: mkd.py:669)."""
    import numpy as np
    out = {}
    for tset, algos in state.items():
        out[tset] = {a: {k: jnp.asarray(np.asarray(v)) for k, v in m.items()}
                     for a, m in algos.items()}
    return out
