"""Pallas TPU kernels for the hot paths (SURVEY.md §7: "The one hot
kernel" tier).

`streaming_min2`: flash-attention-style streaming nearest-neighbor — the
descriptor distance matrix is computed tile-by-tile on the MXU and reduced
to per-row (min1, min2, argmin1) on the fly, so the (N, M) matrix never
touches HBM. For N=M=8192, D=128 this avoids 256 MB of HBM traffic per
direction — the matcher becomes compute-bound instead of bandwidth-bound.

Falls back to the XLA path on non-TPU backends (interpret mode in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["streaming_min2", "match_nn_pallas", "match_smnn_pallas",
           "fused_separable_blur2d"]

_BIG = 1e9  # plain float: jnp constants can't be captured inside kernels


def _min2_kernel(d1_ref, d2_ref, n2_ref, min1_ref, min2_ref, idx_ref):
    """Grid (i, j): rows tile i fixed while j streams over d2 tiles."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min1_ref[:] = jnp.full_like(min1_ref, _BIG)
        min2_ref[:] = jnp.full_like(min2_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    d1 = d1_ref[:]  # (TN, D)
    d2 = d2_ref[:]  # (TM, D)
    n2 = n2_ref[:]  # (1, TM) squared norms of d2 rows
    n1 = jnp.sum(d1 * d1, axis=-1, keepdims=True)  # (TN, 1)
    dots = jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dm = jnp.maximum(n1 + n2 - 2.0 * dots, 0.0)  # (TN, TM)

    TM = dm.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dm.shape, 1)
    # tile-local top-2 (min): find min, mask exactly the argmin, find second
    tmin1 = jnp.min(dm, axis=1, keepdims=True)
    targ1 = jnp.argmin(dm, axis=1)
    masked = jnp.where(col_ids == targ1[:, None], _BIG, dm)
    tmin2 = jnp.min(masked, axis=1)
    tmin1 = tmin1[:, 0]
    targ1 = targ1 + j * TM

    # merge tile stats into running (min1, min2, idx)
    m1 = min1_ref[:][:, 0]
    m2 = min2_ref[:][:, 0]
    ix = idx_ref[:][:, 0]
    new_m1 = jnp.minimum(m1, tmin1)
    new_ix = jnp.where(tmin1 < m1, targ1, ix)
    # second-best = min of the losers and both second-bests
    new_m2 = jnp.minimum(jnp.maximum(m1, tmin1), jnp.minimum(m2, tmin2))
    min1_ref[:] = new_m1[:, None]
    min2_ref[:] = new_m2[:, None]
    idx_ref[:] = new_ix[:, None]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def streaming_min2(d1: jax.Array, d2: jax.Array, tile_n: int = 256,
                   tile_m: int = 256, interpret: bool = False
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row nearest and second-nearest squared-L2 over d2.

    d1 (N, D), d2 (M, D) → (min1 (N,), min2 (N,), argmin1 (N,)).
    N, M should be multiples of the tile sizes (pad with _BIG rows).
    """
    N, D = d1.shape
    M = d2.shape[0]
    tile_n = min(tile_n, N)
    tile_m = min(tile_m, M)
    n2 = jnp.sum(d2 * d2, axis=-1)[None, :]  # (1, M)
    grid = (N // tile_n, M // tile_m)
    out_shape = (
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.int32),
    )
    min1, min2, idx = pl.pallas_call(
        _min2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_m, D), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32), n2.astype(jnp.float32))
    return min1[:, 0], min2[:, 0], idx[:, 0]


def match_nn_pallas(d1: jax.Array, d2: jax.Array, interpret: bool = False):
    """Nearest-neighbor matching via the streaming kernel."""
    m1, _, idx = streaming_min2(d1, d2, interpret=interpret)
    matches = jnp.stack([jnp.arange(d1.shape[0]), idx], -1)
    return m1[:, None], matches


def match_smnn_pallas(d1: jax.Array, d2: jax.Array, th: float = 0.95,
                      interpret: bool = False):
    """Symmetric-ratio mutual NN (reference matching.py:197 semantics) with
    both passes streamed — no (N, M) matrix in HBM."""
    f_min1, f_min2, f_idx = streaming_min2(d1, d2, interpret=interpret)
    b_min1, b_min2, b_idx = streaming_min2(d2, d1, interpret=interpret)
    ratio_f = jnp.sqrt(f_min1 / jnp.maximum(f_min2, 1e-12))
    ratio_b = jnp.sqrt(b_min1 / jnp.maximum(b_min2, 1e-12))
    mutual = b_idx[f_idx] == jnp.arange(d1.shape[0])
    valid = mutual & (ratio_f <= th) & (ratio_b[f_idx] <= th) & \
        (f_min1 < _BIG / 2)
    ratio_max = jnp.maximum(ratio_f, ratio_b[f_idx])
    matches = jnp.stack([jnp.arange(d1.shape[0]), f_idx], -1)
    return ratio_max[:, None], matches, valid


# -----------------------------------------------------------------------------
# Fused separable blur
# -----------------------------------------------------------------------------


def _blur_kernel(x_ref, wv_ref, wh_ref, o_ref, *, ky, kx, H, W):
    """NB images per instance: vertical then horizontal pass entirely in
    VMEM — ONE HBM read + write instead of two conv round trips. Both
    passes run in f32 regardless of storage dtype (the XLA conv path uses
    bf16 MXU multiplies for f32 inputs)."""
    x = x_ref[...].astype(jnp.float32)        # (NB, H + ky - 1, W + kx - 1)
    acc = wv_ref[0, 0] * x[:, 0:H, :]
    for k in range(1, ky):
        acc += wv_ref[0, k] * x[:, k:k + H, :]
    out = wh_ref[0, 0] * acc[:, :, 0:W]
    for k in range(1, kx):
        out += wh_ref[0, k] * acc[:, :, k:k + W]
    o_ref[...] = out.astype(o_ref.dtype)


def _blur_kernel_t(x_ref, wv_ref, wh_ref, o_ref, *, ky, kx, H, W):
    """Transpose variant: the horizontal pass runs as a second vertical
    pass on the in-VMEM transposed accumulator, so every shifted read is a
    sublane shift (lane shifts at unaligned offsets are the slow path on
    the VPU)."""
    x = x_ref[...].astype(jnp.float32)        # (NB, Hp, Wp)
    acc = wv_ref[0, 0] * x[:, 0:H, :]
    for k in range(1, ky):
        acc += wv_ref[0, k] * x[:, k:k + H, :]
    acc_t = jnp.swapaxes(acc, 1, 2)           # (NB, Wp, H)
    out_t = wh_ref[0, 0] * acc_t[:, 0:W, :]
    for k in range(1, kx):
        out_t += wh_ref[0, k] * acc_t[:, k:k + W, :]
    o_ref[...] = jnp.swapaxes(out_t, 1, 2).astype(o_ref.dtype)


def _blur_kernel_mm2(x_ref, sv_ref, sh_ref, o_ref, *, precision):
    """Both passes as MXU matmuls with the border handling folded into the
    banded operator matrices: out = S_v · x · S_hᵀ. No padded copy of the
    input ever touches HBM — exactly one read and one write per pixel."""
    x = x_ref[...]                            # (NB, H, W)
    prec = (jax.lax.Precision.HIGHEST if precision == "float32"
            else jax.lax.Precision.DEFAULT)
    # acc[n, i, w] = sum_h sv[i, h] x[n, h, w]
    acc = jax.lax.dot_general(
        sv_ref[...], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (H, NB, W)
    # out[n, i, j] = sum_w acc[i, n, w] sh[j, w]
    out = jax.lax.dot_general(
        acc, sh_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (H, NB, W)
    o_ref[...] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


def _band_matrix(kernel: jax.Array, size: int, border_type: str) -> jax.Array:
    """(size, size) 'same'-correlation operator with the border rule folded
    in: row i sums kernel[k] into column reflect/clamp/wrap(i + k - pad)."""
    k = kernel.shape[-1]
    pad = k // 2
    rows = jnp.arange(size)[:, None]
    taps = rows + jnp.arange(k)[None, :] - pad  # (size, k)
    if border_type == "reflect":
        idx = jnp.abs(taps)
        idx = jnp.where(idx >= size, 2 * (size - 1) - idx, idx)
        valid = jnp.ones_like(taps, dtype=bool)
    elif border_type == "replicate":
        idx = jnp.clip(taps, 0, size - 1)
        valid = jnp.ones_like(taps, dtype=bool)
    elif border_type == "circular":
        idx = jnp.mod(taps, size)
        valid = jnp.ones_like(taps, dtype=bool)
    else:  # constant (zeros): taps outside contribute nothing
        valid = (taps >= 0) & (taps < size)
        idx = jnp.clip(taps, 0, size - 1)
    w = jnp.where(valid, kernel.astype(jnp.float32)[None, :], 0.0)
    S = jnp.zeros((size, size), jnp.float32)
    return S.at[rows, idx].add(w)


def _blur_kernel_mm(x_ref, wv_ref, sh_ref, o_ref, *, ky, H):
    """Matmul variant: vertical pass by sublane shifts, horizontal pass as
    one (NB*H, Wp) x (Wp, W) banded matmul on the MXU."""
    x = x_ref[...].astype(jnp.float32)        # (NB, Hp, Wp)
    acc = wv_ref[0, 0] * x[:, 0:H, :]
    for k in range(1, ky):
        acc += wv_ref[0, k] * x[:, k:k + H, :]
    out = jax.lax.dot_general(
        acc, sh_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (NB, H, W)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("border_type", "interpret", "variant"))
def fused_separable_blur2d(x: jax.Array, kernel_y: jax.Array,
                           kernel_x: jax.Array,
                           border_type: str = "reflect",
                           interpret: bool = False,
                           variant: str = "shift") -> jax.Array:
    """Separable 2D correlation with both 1-D passes fused in one Pallas
    kernel (ops/filters.py filter2d_separable semantics: pad like two
    consecutive 'same' passes — pad-then-conv commutes across axes for
    reflect/replicate/constant borders). ~1.6x the XLA two-pass path on a
    v5e at (32, 3, 256, 256), k=5, at full f32 precision.

    x (B, C, H, W); kernel_y (ky,), kernel_x (kx,). Padded image blocks
    live in VMEM: intended for H, W <= ~768.
    """
    from .filters import _PAD_MODES
    B, C, H, W = x.shape
    ky = kernel_y.shape[-1]
    kx = kernel_x.shape[-1]
    xf = x.reshape(B * C, H, W)

    if variant in ("mm2", "xla_mm2"):
        sv = _band_matrix(kernel_y.reshape(-1), H, border_type)  # (H, H)
        sh = _band_matrix(kernel_x.reshape(-1), W, border_type)  # (W, W)
        if variant == "xla_mm2":
            acc = jnp.einsum("ih,nhw->niw", sv, xf.astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
            out = jnp.einsum("niw,jw->nij", acc, sh,
                             precision=jax.lax.Precision.HIGHEST)
            return out.astype(x.dtype).reshape(B, C, H, W)
        N = B * C
        per_img = 3 * H * W * 4
        fixed = (H * H + W * W) * 4
        NB = 1
        for cand in (8, 4, 2):
            if N % cand == 0 and cand * per_img + fixed <= 6 * 1024 * 1024:
                NB = cand
                break
        out = pl.pallas_call(
            functools.partial(_blur_kernel_mm2, precision="float32"),
            grid=(N // NB,),
            in_specs=[
                pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
                pl.BlockSpec((H, H), lambda n: (0, 0)),
                pl.BlockSpec((W, W), lambda n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
            interpret=interpret,
        )(xf.astype(jnp.float32), sv, sh)
        return out.reshape(B, C, H, W)

    pads = [(0, 0), (ky // 2, (ky - 1) // 2), (kx // 2, (kx - 1) // 2)]
    xp = jnp.pad(xf, pads, mode=_PAD_MODES[border_type])
    N, Hp, Wp = xp.shape
    wv = kernel_y.reshape(1, ky).astype(jnp.float32)
    wh = kernel_x.reshape(1, kx).astype(jnp.float32)

    # largest image-block that keeps (input + acc + out) under ~6 MB VMEM
    per_img = (Hp * Wp + H * Wp + H * W) * 4
    NB = 1
    for cand in (8, 4, 2):
        if N % cand == 0 and cand * per_img <= 6 * 1024 * 1024:
            NB = cand
            break

    if variant == "matmul":
        # banded horizontal operator: S[k + j, j] = wh[k]
        sh = jnp.zeros((Wp, W), jnp.float32)
        for k in range(kx):
            sh = sh.at[jnp.arange(W) + k, jnp.arange(W)].add(wh[0, k])
        out = pl.pallas_call(
            functools.partial(_blur_kernel_mm, ky=ky, H=H),
            grid=(N // NB,),
            in_specs=[
                pl.BlockSpec((NB, Hp, Wp), lambda n: (n, 0, 0)),
                pl.BlockSpec((1, ky), lambda n: (0, 0)),
                pl.BlockSpec((Wp, W), lambda n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
            interpret=interpret,
        )(xp, wv, sh)
        return out.reshape(B, C, H, W)

    kern = {"shift": _blur_kernel, "transpose": _blur_kernel_t}[variant]
    out = pl.pallas_call(
        functools.partial(kern, ky=ky, kx=kx, H=H, W=W),
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec((NB, Hp, Wp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, ky), lambda n: (0, 0)),
            pl.BlockSpec((1, kx), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, H, W), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W), x.dtype),
        interpret=interpret,
    )(xp, wv, wh)
    return out.reshape(B, C, H, W)
